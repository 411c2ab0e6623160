"""One-time k=20 SRS generation on the TPU (BASELINE one-host config).

Writes .bench_cache/srs_k20.bin (SCALE, interop) and
.bench_cache/srs_k20_packed.npz (pre-packed Montgomery limb planes —
loads in ~1 s vs minutes of per-point Python for the SCALE form).
Run: python tools/gen_srs20.py [K]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from dusk_plonk_tpu.prelude import PlonkParams
from dusk_plonk_tpu.rng.chacha import ChaCha12Rng
from dusk_plonk_tpu.ops.ec import device_g1
from dusk_plonk_tpu.proving.proof import _g1_scale, _g2_scale


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    cache = os.path.join(repo, ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    rng = ChaCha12Rng.seed_from_u64(8349)

    t0 = time.time()
    pp = PlonkParams.setup_device(k, rng)
    print(f"setup_device k={k}: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    G1 = device_g1()
    tx, ty, tz = G1.pack_points(pp.powers)
    arrs = [np.asarray(jax.device_get(c)).astype("<u2")
            for c in (tx, ty, tz)]
    np.savez(os.path.join(cache, f"srs_k{k}_packed.npz"),
             tx=arrs[0], ty=arrs[1], tz=arrs[2],
             h=np.frombuffer(_g2_scale(pp.h), np.uint8),
             beta_h=np.frombuffer(_g2_scale(pp.beta_h), np.uint8),
             g=np.frombuffer(_g1_scale(pp.powers[0]), np.uint8))
    print(f"packed npz: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    with open(os.path.join(cache, f"srs_k{k}.bin"), "wb") as f:
        f.write(pp.to_bytes())
    print(f"scale bin: {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
