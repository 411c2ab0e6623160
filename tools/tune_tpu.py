"""One-off TPU tuning harness: measures MSM / NTT kernel variants on the
real chip so config defaults are evidence, not guesses.

Usage:  python tools/tune_tpu.py msm [n_log2 ...]
        python tools/tune_tpu.py ntt [k ...]

Not part of the driver contract (bench.py is); prints human-readable
timings to stdout.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _sync(out):
    import jax
    for c in jax.tree.leaves(out):
        np.asarray(jax.device_get(c))


def _bench(fn, *args, reps=3):
    _sync(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def tune_msm(n: int):
    import jax
    from bench import _random_points, _enable_compile_cache
    from dusk_plonk_tpu.ops.msm import MsmPlan, pick_window_bits
    from dusk_plonk_tpu.ops.limb import fr_field
    from dusk_plonk_tpu.fields.constants import R_MOD
    from dusk_plonk_tpu.utils.config import set_config, get_config

    _enable_compile_cache()
    rng = np.random.default_rng(8349)
    points = _random_points(n, rng)
    F = fr_field()
    scalars = [int.from_bytes(rng.bytes(32), "little") % R_MOD
               for _ in range(n)]
    limbs = F.pack(scalars, to_mont=False)

    default_cl = get_config().msm_chunk_len
    wb = pick_window_bits(n)
    combos = []
    for cl in (default_cl, 128, 64):
        combos.append((cl, wb))
    combos.append((128, wb + 1))
    combos.append((128, wb - 1))

    seen = set()
    for cl, c in combos:
        if (cl, c) in seen or not 2 <= c <= 16:
            continue
        seen.add((cl, c))
        set_config(msm_chunk_len=cl)
        try:
            plan = MsmPlan(n, window_bits=c)
            em = plan.prepare_points(points)
            t = _bench(plan._msm_fn, em, limbs)
            print(f"msm n=2^{n.bit_length()-1} chunk_len={cl} c={c} "
                  f"W={plan.num_windows} wg={plan.wg}: {t*1000:.1f} ms "
                  f"({n/t/1e3:.0f}k pts/s)", flush=True)
        except Exception as e:
            print(f"msm chunk_len={cl} c={c}: FAILED {e}", flush=True)
        finally:
            set_config(msm_chunk_len=default_cl)


def tune_ntt(k: int):
    import jax
    from bench import _enable_compile_cache
    from dusk_plonk_tpu.ops.ntt import ntt_plan
    from dusk_plonk_tpu.ops.limb import fr_field
    from dusk_plonk_tpu.utils.config import set_config, get_config
    from dusk_plonk_tpu.fields.constants import R_MOD

    _enable_compile_cache()
    import jax.numpy as jnp

    F = fr_field()
    n = 1 << k
    batch = 2  # the 8n pair shape
    rng = np.random.default_rng(8349)
    vals = [int.from_bytes(rng.bytes(32), "little") % R_MOD
            for _ in range(batch * n)]
    x = F.pack(vals, shape=(batch, n))

    default_tile = get_config().ntt_tile
    import jax as _jax
    for tile in (default_tile, 2048, 4096, 8192):
        if tile > n:
            continue
        set_config(ntt_tile=tile)
        try:
            from dusk_plonk_tpu.ops import ntt as ntt_mod
            ntt_mod.ntt_plan.cache_clear()
            plan = ntt_plan(k)
            fn = _jax.jit(lambda v: plan.coset_dft(v))
            t = _bench(fn, x)
            print(f"ntt k={k} tile={tile}: {t*1000:.1f} ms "
                  f"({batch*n/t/1e6:.1f}M elems/s)", flush=True)
        except Exception as e:
            print(f"ntt tile={tile}: FAILED {e}", flush=True)
        finally:
            set_config(ntt_tile=default_tile)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "msm"
    args = [int(a) for a in sys.argv[2:]]
    if mode == "msm":
        for lg in (args or [16]):
            tune_msm(1 << lg)
    else:
        for k in (args or [19]):
            tune_ntt(k)
