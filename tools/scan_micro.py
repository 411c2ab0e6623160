"""Micro-benchmark: just the fused EC scan kernels at the 2^16 MSM shape.
Run: python tools/scan_micro.py [cl lanes]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from dusk_plonk_tpu.ops.limb import fq_field
from dusk_plonk_tpu.fields.constants import Q_MOD
import dusk_plonk_tpu.ops.pallas_field as pf

cl = int(sys.argv[1]) if len(sys.argv) > 1 else 256
lanes = int(sys.argv[2]) if len(sys.argv) > 2 else 5120
Fq = fq_field()
rng = np.random.default_rng(0)


def rand_fq(m):
    vals = [int.from_bytes(rng.bytes(48), "little") % Q_MOD
            for _ in range(min(m, 512))]
    reps = -(-m // len(vals))
    return Fq.pack((vals * reps)[:m])


def _fetch(x):
    for c in jax.tree.leaves(x):
        np.asarray(jax.device_get(c))


def timeit(fn, *args, reps=4):
    t0 = time.perf_counter()
    _fetch(fn(*args))
    comp = time.perf_counter() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        _fetch(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, comp


g = jnp.concatenate([
    rand_fq(lanes * cl).reshape(24, cl, lanes).transpose(1, 0, 2),
    rand_fq(lanes * cl).reshape(24, cl, lanes).transpose(1, 0, 2)], axis=1)
adds = cl * lanes

for name, fn in (("scan16", pf.ec_scan_mixed),
                 ("scan14", pf.ec_scan_mixed14)):
    @jax.jit
    def k(g, fn=fn):
        ps = fn(g)
        return tuple(x[-1][:, :2] for x in jax.tree.leaves(ps))
    t, c = timeit(k, g)
    print(f"{name} ({cl}, 2L, {lanes}): {t*1e3:.1f} ms -> "
          f"{adds/t/1e6:.2f} M adds/s  [compile {c:.0f}s]", flush=True)
