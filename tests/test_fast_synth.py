"""FastPlonk (witness-only synthesis) and columnar gadget equivalence.

The device engine re-synthesizes per proof in FastPlonk mode with
compile-cached wire columns (reference re-synthesis: src/prover.rs:76-78);
these tests pin that the fast mode produces byte-identical witness values,
public inputs and gate counts to the full composer, and that the columnar
builders emit exactly the gates the per-gate loop would.
"""

import numpy as np

from dusk_plonk_tpu.composer.composer import Plonk, FastPlonk, Error
from dusk_plonk_tpu.composer.constraint import Constraint
from dusk_plonk_tpu.curves import jubjub as jj


def _mixed_synthesize(c, x=7):
    w = c.append_witness(x)
    acc = c.append_witness(1)
    for _ in range(5):
        acc = c.gate_mul(Constraint().mult(1).a(acc).b(w))
    c.component_range(w, 36)
    c.append_logic_xor(w, acc, 32)
    c.append_logic_and(w, acc, 16)
    c.component_boolean(c.append_witness(1))
    bits = c.component_decomposition(w, 8)
    c.component_select(bits[0], w, acc)
    p = c.append_point(jj.GENERATOR)
    c.component_add_point(p, p)
    d = c.append_public(123)
    c.gate_add(Constraint().left(1).right(2).a(d).b(w))
    return c


def test_fast_plonk_matches_full():
    full = _mixed_synthesize(Plonk.initialize())
    fast = _mixed_synthesize(FastPlonk.initialize())
    assert fast.witness == full.witness
    assert fast.m() == full.m()
    assert fast.instance == full.instance
    assert fast.public_input_indexes() == full.public_input_indexes()
    assert fast.instance_values() == full.instance_values()


def test_fast_plonk_mul_generator():
    s = 0x1234567890ABCDEF
    for cls in (Plonk, FastPlonk):
        c = cls.initialize()
        w = c.append_witness(s)
        c.component_mul_generator(w, jj.GENERATOR)
        if cls is Plonk:
            full_wit, full_m = c.witness, c.m()
    assert c.witness == full_wit
    assert c.m() == full_m


def test_mul_chain_matches_gate_mul_loop():
    loop = Plonk.initialize()
    w = loop.append_witness(3)
    acc = loop.append_witness(1)
    for _ in range(9):
        acc = loop.gate_mul(Constraint().mult(1).a(acc).b(w))

    chain = Plonk.initialize()
    w2 = chain.append_witness(3)
    acc2 = chain.append_witness(1)
    out = chain.append_mul_chain(acc2, w2, 9)

    assert out == acc
    assert chain.witness == loop.witness
    assert chain.constraints == loop.constraints
    assert [list(c) for c in chain.wire_cols] == \
        [list(c) for c in loop.wire_cols]
    assert chain.perm.witness_map == loop.perm.witness_map

    fastc = FastPlonk.initialize()
    w3 = fastc.append_witness(3)
    acc3 = fastc.append_witness(1)
    out3 = fastc.append_mul_chain(acc3, w3, 9)
    assert out3 == out
    assert fastc.witness == loop.witness
    assert fastc.m() == loop.m()


def test_wire_plan_gather_matches_wire_values():
    from dusk_plonk_tpu.proving.engine import DeviceEngine

    cs = _mixed_synthesize(Plonk.initialize())
    n = 1 << 10
    cols, nw, m = DeviceEngine.build_wire_plan(cs, n)
    assert nw == len(cs.witness) and m == cs.m()

    buf = b"".join(v.to_bytes(32, "little") for v in cs.witness)
    wit = np.frombuffer(buf + bytes(32), dtype="<u2").reshape(nw + 1, 16)
    gathered = wit[cols]                                  # (4, n, 16)
    flat = [int.from_bytes(gathered[c, i].tobytes(), "little")
            for c in range(4) for i in range(n)]
    assert flat == cs.wire_values(n)


def test_fast_synth_shape_mismatch_raises():
    """Engine rejects a circuit whose live shape differs from compile."""
    from dusk_plonk_tpu.proving.engine import DeviceEngine

    class Obj:
        pass

    eng = Obj()
    eng.n = 16
    compile_cs = Plonk.initialize()
    compile_cs.append_witness(5)
    eng._wire_plan = DeviceEngine.build_wire_plan(compile_cs, 16)

    class GrowingCircuit:
        def synthesize(self, c):
            c.append_witness(5)
            c.append_witness(6)          # extra witness vs compile

    try:
        DeviceEngine._synthesize_fast(eng, GrowingCircuit())
    except Error:
        pass
    else:
        raise AssertionError("shape mismatch not detected")
