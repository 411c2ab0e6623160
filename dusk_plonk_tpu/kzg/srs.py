"""KZG10 public parameters (SRS), commitments, and aggregate openings.

Mirrors the surface the reference consumes from `zksnarks::plonk::PlonkParams`
(usage: tests/range.rs:26 `setup(k, rng)`; src/key.rs:82 `.trim`;
src/prover.rs:133-136 `.commit`; src/prover.rs:422-452
`.compute_aggregate_witness`; src/key.rs:320 `.verification_key()`).

Commitments run through a pluggable MSM engine: the host Pippenger by default,
the device (JAX) Pippenger when an `msm_fn` is injected — the prover injects
the device engine (see proving/prover.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..fields.constants import R_MOD
from ..curves import bls
from ..rng.chacha import fr_random


@dataclass
class EvaluationKey:
    """Verifier-side opening key (poly-commit `EvaluationKey`; fields g,
    prepared_beta_h, prepared_h visible at reference
    src/commitment_scheme.rs:51-58)."""
    g: tuple                 # G1 generator
    h: tuple                 # G2 generator
    beta_h: tuple            # tau * G2


class PlonkParams:
    """Powers-of-tau SRS in G1 plus (h, tau*h) in G2."""

    def __init__(self, powers: list, h, beta_h, packed=None, g=None):
        self.powers = powers            # [tau^i * G1] affine (None if packed)
        self.h = h
        self.beta_h = beta_h
        self.msm_fn = None              # injected device MSM: (points, scalars) -> point
        # packed: ((24,N),)*3 uint32 numpy Montgomery limb planes — the
        # device-ready SRS form (large configs skip the per-point Python
        # host list entirely; see tools/gen_srs20.py / from_packed_npz)
        self.packed = packed
        self._g = g                     # generator affine (packed mode)

    def n_powers(self) -> int:
        return self.packed[0].shape[-1] if self.packed is not None \
            else len(self.powers)

    @classmethod
    def from_packed_npz(cls, path) -> "PlonkParams":
        """Load the pre-packed Montgomery limb-plane SRS (written by
        tools/gen_srs20.py): ~1 s for 2^20 points vs minutes of per-point
        Python for the SCALE form.  Host `powers` are unavailable; only
        the device compile/prove path works."""
        import numpy as np
        from ..proving.proof import _g1_unscale, _g2_unscale
        z = np.load(path)
        packed = tuple(z[k].astype(np.uint32) for k in ("tx", "ty", "tz"))
        h = _g2_unscale(z["h"].tobytes())
        beta_h = _g2_unscale(z["beta_h"].tobytes())
        g = _g1_unscale(z["g"].tobytes())
        return cls(None, h, beta_h, packed=packed, g=g)

    def to_bytes(self) -> bytes:
        """SCALE layout (reference `PlonkParams` persistence surface,
        SURVEY.md §5.4): compact(len) ++ len x G1Affine(97B) ++
        G2Affine h (193B) ++ G2Affine beta_h."""
        from ..proving.proof import (_g1_scale, _g2_scale,
                                     scale_compact_encode)
        out = [scale_compact_encode(len(self.powers))]
        out.extend(_g1_scale(p) for p in self.powers)
        out.append(_g2_scale(self.h))
        out.append(_g2_scale(self.beta_h))
        return b"".join(out)

    @classmethod
    def from_bytes(cls, data: bytes) -> "PlonkParams":
        from ..proving.proof import (_g1_unscale, _g2_unscale,
                                     scale_compact_decode)
        n, off = scale_compact_decode(data, 0)
        if len(data) != off + 97 * n + 193 * 2:
            raise ValueError(f"bad PlonkParams length {len(data)}")
        powers = [_g1_unscale(data[off + 97 * i:off + 97 * (i + 1)])
                  for i in range(n)]
        off += 97 * n
        h = _g2_unscale(data[off:off + 193])
        beta_h = _g2_unscale(data[off + 193:off + 386])
        return cls(powers, h, beta_h)

    @classmethod
    def setup(cls, k: int, rng) -> "PlonkParams":
        """Trusted setup for max degree 2^k (tests regenerate this
        deterministically from the seeded StdRng; draw: one Fr::random)."""
        tau = fr_random(rng)
        # 2^k plus the max blinding degree (6): blinded wires reach degree
        # n+2 and the t_4 quotient chunk n+5 even when the circuit occupies
        # the whole domain (upstream dusk-plonk's EXTRA_BLINDING_DEGREE).
        n = (1 << k) + 7
        # fixed-base windowed generation: precompute 8-bit windows of G
        powers = _fixed_base_powers(bls.G1_GENERATOR, tau, n)
        h = bls.G2_GENERATOR
        beta_h = bls.g2_mul(h, tau)
        return cls(powers, h, beta_h)

    @classmethod
    def setup_device(cls, k: int, rng) -> "PlonkParams":
        """Device-accelerated trusted setup: identical RNG draw and output
        to `setup` (differential-tested), but the n fixed-base scalar
        multiplications run as one batched gather + EC tree-reduce on
        device instead of a host ladder."""
        import numpy as np
        import jax.numpy as jnp
        from ..rng.chacha import fr_random as _fr_random
        from ..ops.ec import device_g1
        from ..ops.limb import fr_field

        from ..utils.tracing import tracer

        tau = _fr_random(rng)
        n = (1 << k) + 7

        # host: 8-bit window tables of G (32 x 256 points, ~8k cheap adds)
        window = 8
        windows = 32
        G1 = device_g1()
        with tracer.span("srs.window_tables"):
            tables = []
            cur = bls._jac_from_affine(bls.G1_GENERATOR)
            for _ in range(windows):
                row = [None]
                acc = (1, 1, 0)
                for _ in range(1, 1 << window):
                    acc = bls._jac_add(acc, cur)
                    row.append(bls._jac_to_affine(acc))
                tables.append(row)
                for _ in range(window):
                    cur = bls._jac_double(cur)
            flat = [p for row in tables for p in row]
        with tracer.span("srs.pack_tables"):
            tx, ty, tz = G1.pack_points(flat)        # (24, 32*256) each

        # host: tau power ladder (canonical ints), then 8-bit digits
        F = fr_field()
        with tracer.span("srs.tau_ladder"):
            scalars = [1] * n
            for i in range(1, n):
                scalars[i] = scalars[i - 1] * tau % R_MOD
            limbs = F.pack_host(scalars)                     # (16, n) numpy
        lo = limbs & 0xFF
        hi = (limbs >> 8) & 0xFF
        digits = np.stack([lo, hi], axis=1).reshape(32, n)   # (32, n)
        # pure numpy: an eager jnp round-trip here cost minutes on the
        # tunneled backend (device arrays ride into the jit as args below)
        flat_idx = (digits.astype(np.int64)
                    + np.arange(32)[:, None] * 256).astype(np.int32)

        # device: gather window entries, then reduce the 32 windows
        # LEVEL BY LEVEL as separate dispatches — the axon XLA allocator
        # does not reuse temp buffers inside one program, so a fused
        # 5-level EC-add tree on (24, 32, n) plans >15 GB and aborts
        import jax

        # ONE gather executable + ONE pairwise-add executable, re-dispatched
        # per window: the axon XLA allocator does not reuse temp buffers
        # inside a program, so anything wider than a single (24, n) EC add
        # plans tens of GB and aborts.  31 tiny dispatches instead.
        @jax.jit
        def gather1(tx, ty, tz, idx1):
            return (tx[:, idx1], ty[:, idx1], tz[:, idx1])   # (24, n)

        @jax.jit
        def addp(p, q):
            return G1.add(p, q)

        with tracer.span("srs.device_reduce"):
            # streaming accumulation, not a tree: holding all 32 gathered
            # (24, n) window buffers peaks at ~9.6 GB HBM at k=20 (the
            # 16 GB chip OOMs once the first reduce level doubles it);
            # the running-sum chain keeps peak residency at 3 buffers
            out = gather1(tx, ty, tz, flat_idx[0])
            for w in range(1, windows):
                out = addp(out, gather1(tx, ty, tz, flat_idx[w]))
            jax.block_until_ready(out)
        with tracer.span("srs.unpack"):
            powers = G1.unpack_points(out)

        h = bls.G2_GENERATOR
        beta_h = bls.g2_mul(h, tau)
        return cls(powers, h, beta_h)

    def trim(self, degree: int) -> "PlonkParams":
        """Truncate to `degree` (reference src/key.rs:82 trims to
        (m+6).next_power_of_two())."""
        if degree + 1 > self.n_powers():
            raise ValueError(
                f"SRS too small: need degree {degree}, have {self.n_powers() - 1}")
        keep = min(degree + 7, self.n_powers())
        if self.packed is not None:
            trimmed = PlonkParams(
                None, self.h, self.beta_h,
                packed=tuple(c[:, :keep] for c in self.packed), g=self._g)
        else:
            trimmed = PlonkParams(self.powers[:keep], self.h, self.beta_h)
        trimmed.msm_fn = self.msm_fn
        return trimmed

    def max_degree(self) -> int:
        return self.n_powers() - 1

    def commit(self, coeffs: list[int]):
        """Commitment = MSM(powers[:len], coeffs)."""
        if len(coeffs) > len(self.powers):
            raise ValueError("polynomial degree exceeds SRS")
        if self.msm_fn is not None:
            return self.msm_fn(self.powers[: len(coeffs)], coeffs)
        return bls.g1_msm(self.powers[: len(coeffs)], coeffs)

    def compute_aggregate_witness(self, polys: list[list[int]], point: int,
                                  v_challenge: int) -> list[int]:
        """Fold polynomials by powers of v, then divide by (X - point)
        via Ruffini synthetic division (reference src/prover.rs:422-452)."""
        folded: list[int] = []
        power = 1
        for p in polys:
            if len(p) > len(folded):
                folded += [0] * (len(p) - len(folded))
            for i, c in enumerate(p):
                folded[i] = (folded[i] + c * power) % R_MOD
            power = power * v_challenge % R_MOD
        # synthetic division: quotient of folded / (X - point)
        quotient = [0] * max(len(folded) - 1, 1)
        acc = 0
        for i in range(len(folded) - 1, 0, -1):
            acc = (acc * point + folded[i]) % R_MOD
            quotient[i - 1] = acc
        return quotient

    def verification_key(self) -> EvaluationKey:
        g = self._g if self.packed is not None else self.powers[0]
        return EvaluationKey(g=g, h=self.h, beta_h=self.beta_h)


def _fixed_base_powers(base, tau: int, n: int) -> list:
    """[tau^i * base for i in 0..n) via 8-bit windowed fixed-base tables."""
    window = 8
    windows = (255 + window - 1) // window
    # table[w][d] = d * 2^(8w) * base  (d in 0..256)
    tables = []
    cur = bls._jac_from_affine(base)
    for _ in range(windows):
        row = [(1, 1, 0)]
        for d in range(1, 1 << window):
            row.append(bls._jac_add(row[-1], cur))
        tables.append(row)
        for _ in range(window):
            cur = bls._jac_double(cur)

    out = []
    scalar = 1
    for _ in range(n):
        acc = (1, 1, 0)
        s = scalar
        w = 0
        while s:
            d = s & 0xFF
            if d:
                acc = bls._jac_add(acc, tables[w][d])
            s >>= window
            w += 1
        out.append(bls._jac_to_affine(acc))
        scalar = scalar * tau % R_MOD
    return out
