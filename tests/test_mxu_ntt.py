"""Differential tests of the MXU four-step NTT (ops/mxu_ntt.py) against
the host-oracle domain transforms — run on CPU via ntt_mxu_force (int8
einsums on the CPU backend + interpret-mode Pallas reduction)."""

import numpy as np
import pytest

from dusk_plonk_tpu.fields.constants import R_MOD
from dusk_plonk_tpu.utils.config import set_config, get_config
from dusk_plonk_tpu.ops.limb import fr_field


K = 6  # 64-point domain: n1=8, n2=8 — small enough for interpret mode


@pytest.fixture()
def mxu_plan():
    from dusk_plonk_tpu.ops import ntt as ntt_mod
    cfg = get_config()
    old = (cfg.ntt_mxu_min_k, cfg.ntt_mxu_force)
    set_config(ntt_mxu_min_k=K, ntt_mxu_force=True)
    ntt_mod.ntt_plan.cache_clear()
    plan = ntt_mod.ntt_plan(K)
    assert plan.mxu, "test must exercise the MXU path"
    yield plan
    set_config(ntt_mxu_min_k=old[0], ntt_mxu_force=old[1])
    ntt_mod.ntt_plan.cache_clear()


def _host_domain():
    from dusk_plonk_tpu.poly.domain import Domain
    return Domain(K)


def _rand_vals(n, seed):
    rng = np.random.default_rng(seed)
    return [int.from_bytes(rng.bytes(32), "little") % R_MOD
            for _ in range(n)]


def test_balanced_digits_roundtrip():
    from dusk_plonk_tpu.ops.mxu_ntt import _balanced_digits_host
    vals = _rand_vals(64, 1) + [0, 1, R_MOD - 1]
    dig = _balanced_digits_host(vals)
    assert dig.shape == (33, len(vals))
    recon = sum(int(dig[i, j]) << (8 * i) for i in range(33)
                for j in [0])  # spot-check col 0
    recon = sum(int(dig[i, 0]) << (8 * i) for i in range(33))
    assert recon == vals[0]
    for j in range(len(vals)):
        v = sum(int(dig[i, j]) << (8 * i) for i in range(33))
        assert v == vals[j]


def test_device_digits_match_host():
    import jax
    from dusk_plonk_tpu.ops.mxu_ntt import _balanced_digits_host, _to_digits
    F = fr_field()
    vals = _rand_vals(16, 2) + [0, 1, R_MOD - 1, (1 << 255) - 1]
    x = F.pack(vals, to_mont=False)
    dev = np.asarray(jax.jit(lambda v: _to_digits(F, v))(x))
    host = _balanced_digits_host(vals)
    np.testing.assert_array_equal(dev, host.astype(np.int8))


def test_mxu_dft_matches_host(mxu_plan):
    F = fr_field()
    dom = _host_domain()
    vals = _rand_vals(1 << K, 3)
    x = F.pack(vals, shape=(1 << K,))
    got = F.unpack(mxu_plan.dft(x))
    assert got == dom.dft(vals)


def test_mxu_idft_coset_roundtrips(mxu_plan):
    F = fr_field()
    dom = _host_domain()
    vals = _rand_vals(1 << K, 4)
    x = F.pack(vals, shape=(1 << K,))
    assert F.unpack(mxu_plan.idft(x)) == dom.idft(vals)
    assert F.unpack(mxu_plan.coset_dft(x)) == dom.coset_dft(vals)
    assert F.unpack(mxu_plan.coset_idft(x)) == dom.coset_idft(vals)
    # batched (leading axis) path, as the engine drives it
    xb = F.pack(vals * 2, shape=(2, 1 << K))
    got = F.unpack(mxu_plan.coset_dft(xb))
    assert got == dom.coset_dft(vals) * 2
