"""Merlin transcript and ChaCha12 StdRng tests against published vectors."""

from dusk_plonk_tpu.transcript.merlin import MerlinTranscript, Strobe128
from dusk_plonk_tpu.rng.chacha import (
    ChaCha12Rng, chacha_block, splitmix64_seed,
)


def test_merlin_published_vector():
    """merlin crate's `equivalence_simple` test vector."""
    t = MerlinTranscript(b"test protocol")
    t.append_message(b"some label", b"some data")
    challenge = t.challenge_bytes(b"challenge", 32)
    assert challenge.hex() == \
        "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"


def test_merlin_clone_independent():
    t = MerlinTranscript(b"proto")
    t.append_message(b"a", b"b")
    c = t.clone()
    x = t.challenge_bytes(b"c", 16)
    y = c.challenge_bytes(b"c", 16)
    assert x == y
    t2 = MerlinTranscript(b"proto")
    t2.append_message(b"a", b"DIFFERENT")
    assert t2.challenge_bytes(b"c", 16) != x


def test_chacha20_core_rfc_vector():
    """djb's original ChaCha20 all-zero test vector (first block)."""
    block = chacha_block([0] * 8, 0, (0, 0), 20)
    out = b"".join(w.to_bytes(4, "little") for w in block)
    assert out[:32].hex() == (
        "76b8e0ada0f13d90405d6ae55386bd28"
        "bdd219b8a08ded1aa836efcc8b770dc7")


def test_chacha_ietf_vector():
    """RFC 7539 2.3.2 block function vector (96-bit nonce folded into our
    64-bit counter + 64-bit stream layout: counter word = 1, nonce words
    [0x09000000, 0x4a000000, 0]). Our layout has a 64-bit counter so the
    second counter word aliases the first nonce word."""
    key = [int.from_bytes(bytes(range(4 * i, 4 * i + 4)), "little")
           for i in range(8)]
    counter = 1 | (0x09000000 << 32)
    nonce = (0x4A000000, 0x00000000)
    block = chacha_block(key, counter, nonce, 20)
    out = b"".join(w.to_bytes(4, "little") for w in block)
    assert out.hex().startswith("10f1e7e4d13b5915500fdd1fa32071c4")


def test_splitmix_seed_deterministic():
    s = splitmix64_seed(8349)
    assert len(s) == 32
    assert s == splitmix64_seed(8349)
    assert s != splitmix64_seed(8350)


def test_stdrng_stream_structure():
    rng = ChaCha12Rng.seed_from_u64(8349)
    a = rng.next_u64()
    rng2 = ChaCha12Rng.seed_from_u64(8349)
    lo = rng2.next_u32()
    hi = rng2.next_u32()
    assert a == lo | (hi << 32)
    # fill_bytes consumes whole words; 6 bytes burn 2 words
    rng3 = ChaCha12Rng.seed_from_u64(8349)
    b6 = rng3.fill_bytes(6)
    assert b6 == (lo.to_bytes(4, "little") + hi.to_bytes(4, "little"))[:6]
    nxt = rng3.next_u32()
    rng4 = ChaCha12Rng.seed_from_u64(8349)
    rng4.next_u32(); rng4.next_u32()
    assert nxt == rng4.next_u32()


def test_stdrng_crosses_buffer_boundary():
    rng = ChaCha12Rng.seed_from_u64(1)
    vals = [rng.next_u32() for _ in range(130)]  # crosses the 64-word refill
    rng2 = ChaCha12Rng.seed_from_u64(1)
    big = rng2.fill_bytes(4 * 130)
    for i, v in enumerate(vals):
        assert int.from_bytes(big[4 * i:4 * i + 4], "little") == v
