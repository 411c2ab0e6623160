"""Raw VPU primitive throughput via K-differencing (the axon tunnel's
~30 ms dispatch+fetch roundtrip swamps absolute timings; the difference
between a K1-iteration and a K2-iteration chain isolates device time)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

R = int(sys.argv[1]) if len(sys.argv) > 1 else 256
T = int(sys.argv[2]) if len(sys.argv) > 2 else 512

K1 = 1024
K2 = 8 * K1


def make_fn(op, K):
    def kern(x_ref, y_ref, o_ref):
        x = x_ref[:]

        def step(acc):
            if op == "mul":
                return (acc & 0xFFFF) * x
            elif op == "add":
                return acc + x
            elif op == "mask":
                return (acc & 0xFFFF) | (acc >> 16)
            elif op == "roll":
                return pltpu.roll(acc, 1, axis=0) + x
            elif op == "madd16":
                p = (acc & 0xFFFF) * x
                return acc + (p & 0xFFFF) + pltpu.roll(p >> 16, 1, axis=0)

        def body(i, acc):
            for _ in range(16):
                acc = step(acc)
            return acc

        o_ref[:] = jax.lax.fori_loop(0, K // 16, body, y_ref[:])

    fn = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, T), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return jax.jit(lambda x, y: fn(x, y)[:1, :1])


def best_time(jfn, x, y, reps=5):
    np.asarray(jax.device_get(jfn(x, y)))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(jfn(x, y)))
        best = min(best, time.perf_counter() - t0)
    return best


def run(op):
    x = jnp.asarray(
        np.random.default_rng(0).integers(1, 0xFFFF, (R, T), np.uint32))
    y = jnp.asarray(
        np.random.default_rng(1).integers(1, 0xFFFF, (R, T), np.uint32))
    t1 = best_time(make_fn(op, K1), x, y)
    t2 = best_time(make_fn(op, K2), x, y)
    dt = (t2 - t1) / (K2 - K1)
    nops = {"madd16": 7}.get(op, 1)
    total = R * T * nops
    print(f"{op:8s}: {dt*1e6:8.2f} us/iter ({nops} ops x {R}x{T}) -> "
          f"{total/dt/1e12:.3f} T lane-ops/s")


if __name__ == "__main__":
    for op in ("add", "mul", "madd16"):
        run(op)
