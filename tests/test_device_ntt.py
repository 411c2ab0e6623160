"""Device NTT vs host Domain oracle (differential, all four variants)."""

import random

from dusk_plonk_tpu.fields.constants import R_MOD
from dusk_plonk_tpu.poly.domain import Domain
from dusk_plonk_tpu.ops.ntt import ntt_plan
from dusk_plonk_tpu.ops.limb import fr_field


def _roundtrip(k):
    rnd = random.Random(100 + k)
    n = 1 << k
    vals = [rnd.randrange(R_MOD) for _ in range(n)]
    dom = Domain(k)
    plan = ntt_plan(k)
    F = fr_field()
    packed = F.pack(vals)

    assert F.unpack(plan.dft(packed)) == dom.dft(vals)
    assert F.unpack(plan.idft(packed)) == dom.idft(vals)
    assert F.unpack(plan.coset_dft(packed)) == dom.coset_dft(vals)
    assert F.unpack(plan.coset_idft(packed)) == dom.coset_idft(vals)
    # roundtrip
    assert F.unpack(plan.idft(plan.dft(packed))) == vals
    assert F.unpack(plan.coset_idft(plan.coset_dft(packed))) == vals


def test_ntt_small():
    _roundtrip(3)


def test_ntt_medium():
    _roundtrip(6)


def test_ntt_batched():
    k = 4
    n = 1 << k
    rnd = random.Random(77)
    rows = [[rnd.randrange(R_MOD) for _ in range(n)] for _ in range(3)]
    dom = Domain(k)
    plan = ntt_plan(k)
    F = fr_field()
    flat = [v for row in rows for v in row]
    batched = F.pack(flat, shape=(3, n))
    out = plan.dft(batched)
    got = F.unpack(out)
    expected = [v for row in rows for v in dom.dft(row)]
    assert got == expected
