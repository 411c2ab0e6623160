"""ctypes bindings for the C++ host exactness engine (native/dusk_native.cpp).

Auto-builds the shared library on first import if a compiler is present;
every consumer falls back to the pure-Python oracle when unavailable, so
the native path is a strict accelerator with identical behavior
(differential-tested in tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_SO = os.path.join(_NATIVE_DIR, "libdusk_native.so")

_lib = None
_tried = False


def lib():
    """The loaded library, or None when unavailable."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        L = ctypes.CDLL(_SO)
    except OSError:
        return None
    L.dn_keccak_f1600.argtypes = [ctypes.c_char_p]
    L.dn_chacha_blocks.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint32)]
    L.dn_g1_msm.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64,
        ctypes.c_char_p, ctypes.c_char_p]
    L.dn_fr_ntt.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p]
    L.dn_fr_scale_geo.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_char_p]
    _lib = L
    return _lib


def available() -> bool:
    return lib() is not None


def keccak_f1600(state: bytearray) -> None:
    """In-place permutation of the 200-byte state."""
    buf = ctypes.create_string_buffer(bytes(state), 200)
    lib().dn_keccak_f1600(ctypes.cast(buf, ctypes.c_char_p))
    state[:] = buf.raw[:200]


def chacha_blocks(key_words, counter: int, nonce_words, rounds: int,
                  nblocks: int) -> list[int]:
    """nblocks consecutive 64-byte ChaCha blocks -> 16*nblocks u32 words."""
    key = (ctypes.c_uint32 * 8)(*key_words)
    nonce = (ctypes.c_uint32 * 2)(*nonce_words)
    out = (ctypes.c_uint32 * (16 * nblocks))()
    lib().dn_chacha_blocks(key, counter, nonce, rounds, nblocks, out)
    return list(out)


def g1_msm(points, scalars):
    """Pippenger over affine host points [(x, y) | None] and int scalars."""
    from ..fields.constants import R_MOD
    n = len(points)
    pbuf = bytearray(96 * n)
    inf = bytearray(n)
    for i, p in enumerate(points):
        if p is None:
            inf[i] = 1
        else:
            pbuf[96 * i: 96 * i + 48] = int(p[0]).to_bytes(48, "little")
            pbuf[96 * i + 48: 96 * i + 96] = int(p[1]).to_bytes(48, "little")
    sbuf = b"".join(int(s % R_MOD).to_bytes(32, "little") for s in scalars)
    out = ctypes.create_string_buffer(96)
    out_inf = ctypes.create_string_buffer(1)
    lib().dn_g1_msm(bytes(pbuf), bytes(inf), sbuf, n,
                    ctypes.cast(out, ctypes.c_char_p),
                    ctypes.cast(out_inf, ctypes.c_char_p))
    if out_inf.raw[0] == 1:
        return None
    raw = out.raw
    return (int.from_bytes(raw[:48], "little"),
            int.from_bytes(raw[48:96], "little"))


def fr_ntt(values: list[int], root: int) -> list[int]:
    """In-place radix-2 NTT at powers of `root` (natural order in/out)."""
    n = len(values)
    buf = ctypes.create_string_buffer(
        b"".join(int(v).to_bytes(32, "little") for v in values), 32 * n)
    lib().dn_fr_ntt(ctypes.cast(buf, ctypes.c_char_p), n,
                    int(root).to_bytes(32, "little"))
    raw = buf.raw
    return [int.from_bytes(raw[32 * i:32 * i + 32], "little")
            for i in range(n)]


def fr_scale_geo(values: list[int], s: int, g: int) -> list[int]:
    """[v_i * s * g^i]."""
    n = len(values)
    buf = ctypes.create_string_buffer(
        b"".join(int(v).to_bytes(32, "little") for v in values), 32 * n)
    lib().dn_fr_scale_geo(ctypes.cast(buf, ctypes.c_char_p), n,
                          int(s).to_bytes(32, "little"),
                          int(g).to_bytes(32, "little"))
    raw = buf.raw
    return [int.from_bytes(raw[32 * i:32 * i + 32], "little")
            for i in range(n)]
