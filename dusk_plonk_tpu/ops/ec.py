"""Device G1 point arithmetic (BLS12-381, y^2 = x^3 + 4) over Fq limbs.

TPU-first choice: COMPLETE projective addition (Renes-Costello-Batina 2015,
Algorithm 7 for a=0) — a single branch-free formula that is correct for
P+Q, P+P, P+(-P), P+O and O+O alike.  On a SIMD machine this beats the
reference's Jacobian add-with-branches (host oracle curves/bls.py) because
every lane executes the same instruction stream; it also makes EC addition a
clean associative combiner for jax.lax.associative_scan / segmented scans,
which is what the Pippenger MSM (ops/msm.py) is built on.

Points are pytrees (X, Y, Z) of (..., 24, N) uint32 Montgomery limb arrays
(limb-major; see ops/limb.py).  Identity = (0, 1, 0).  12 Fq muls +
2 mul-by-b3 per addition.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from ..fields.constants import Q_MOD
from .limb import fq_field

B3 = 12  # 3*b for b=4


class DeviceG1:
    def __init__(self):
        self.F = fq_field()
        F = self.F
        # numpy constants (Montgomery form computed host-side): captured
        # device arrays cost ~3 ms per jitted call on axon — see ops/limb.py
        from .limb import _int_to_limbs
        spec = F.spec

        def mont_np(v):
            return _int_to_limbs(spec, v * spec.mont_r % spec.modulus)[:, None]
        self.b3 = mont_np(B3)
        self.identity = (mont_np(0), mont_np(1), mont_np(0))  # (24, 1) each
        from ..curves.bls import G1_GENERATOR
        # affine generator (z = 1): the scalar-0 pad point for MSM inputs
        # that must stay strictly affine (ops/msm.py mixed-add scan)
        self.generator_affine = (mont_np(G1_GENERATOR[0]),
                                 mont_np(G1_GENERATOR[1]))

    def _mul12(self, F, x):
        """12*x = 8x + 4x via 4 modular adds — replaces the b3 Montgomery
        mul (b=4, b3=12): a mont mul is ~15x the vector work of an add."""
        x2 = F.add(x, x)
        x4 = F.add(x2, x2)
        x8 = F.add(x4, x4)
        return F.add(x8, x4)

    # -- host <-> device ---------------------------------------------------------

    def pack_points(self, affine_points):
        """[(x, y) | None] -> ((24,N),(24,N),(24,N)) projective Montgomery."""
        xs, ys, zs = [], [], []
        for p in affine_points:
            if p is None:
                xs.append(0); ys.append(1); zs.append(0)
            else:
                xs.append(p[0]); ys.append(p[1]); zs.append(1)
        F = self.F
        return (F.pack(xs), F.pack(ys), F.pack(zs))

    def unpack_points(self, pts):
        """Projective device points (24, N) -> [(x, y) | None].

        The X/Z, Y/Z division runs ON DEVICE as one batched Fermat
        inverse (rolled square-and-multiply) — a host loop of per-point
        `pow(z, -1, p)` took 246 s for a 2^16 SRS (measured); this is one
        dispatch + one fetch."""
        import numpy as np
        F = self.F
        coords, inf = self._jit_to_affine(pts[0], pts[1], pts[2])
        coords = np.asarray(jax.device_get(coords)).astype("<u2")
        inf = np.asarray(jax.device_get(inf))
        out = []
        for i in range(coords.shape[-1]):
            if inf[i]:
                out.append(None)
            else:
                x = int.from_bytes(coords[0, :, i].tobytes(), "little")
                y = int.from_bytes(coords[1, :, i].tobytes(), "little")
                out.append((x, y))
        return out

    @partial(jax.jit, static_argnums=0)
    def _jit_to_affine(self, X, Y, Z):
        F = self.F
        zinv = F.pow_const(Z, F.spec.modulus - 2)    # 0 stays 0
        ax = F.from_mont(F.mul(X, zinv))
        ay = F.from_mont(F.mul(Y, zinv))
        inf = jnp.all(Z == 0, axis=-2)               # (N,)
        return jnp.stack([ax, ay]), inf

    # -- complete addition (RCB15 alg. 7, a=0) --------------------------------------

    def add(self, p, q):
        """Complete addition; routes to the fused Pallas kernel on TPU for
        large 2-D/3-D batches (ops/pallas_field.py), XLA otherwise."""
        from .limb import _pallas_wanted
        x1 = p[0]
        if (_pallas_wanted() and x1.ndim >= 2 and x1.shape[-2] == self.F.L
                and x1.shape == q[0].shape and x1.shape[-1] >= 128):
            from . import pallas_field as pf
            if x1.ndim == 2:
                return pf.ec_add(p, q)
            lead = x1.shape[:-2]
            tail = x1.shape[-2:]
            fp = tuple(c.reshape((-1,) + tail) for c in p)
            fq_ = tuple(c.reshape((-1,) + tail) for c in q)
            out = jax.vmap(pf.ec_add)(fp, fq_)
            return tuple(c.reshape(lead + tail) for c in out)
        return self._add_xla(p, q)

    def _add_xla(self, p, q):
        F = self.F
        x1, y1, z1 = p
        x2, y2, z2 = q

        t0 = F.mul(x1, x2)
        t1 = F.mul(y1, y2)
        t2 = F.mul(z1, z2)
        t3 = F.mul(F.add(x1, y1), F.add(x2, y2))
        t3 = F.sub(t3, F.add(t0, t1))              # x1y2 + x2y1
        t4 = F.mul(F.add(y1, z1), F.add(y2, z2))
        t4 = F.sub(t4, F.add(t1, t2))              # y1z2 + y2z1
        x3 = F.mul(F.add(x1, z1), F.add(x2, z2))
        y3 = F.sub(x3, F.add(t0, t2))              # x1z2 + x2z1
        x3 = F.add(t0, t0)
        t0 = F.add(x3, t0)                         # 3 x1x2
        t2 = self._mul12(F, t2)                    # b3 z1z2
        z3 = F.add(t1, t2)
        t1 = F.sub(t1, t2)
        y3 = self._mul12(F, y3)                    # b3 (x1z2 + x2z1)
        x3 = F.mul(t4, y3)
        t2 = F.mul(t3, t1)
        x3 = F.sub(t2, x3)
        y3 = F.mul(y3, t0)
        t1 = F.mul(t1, z3)
        y3 = F.add(t1, y3)
        t0 = F.mul(t0, t3)
        z3 = F.mul(z3, t4)
        z3 = F.add(z3, t0)
        return (x3, y3, z3)

    def add_mixed(self, p, q2):
        """p + (x2, y2) with q strictly AFFINE (z2 = 1, never the identity):
        the RCB15 complete-mixed specialization — 11 Fq muls (vs 12 + 2
        b3-muls), still branch-free and correct for p = identity, p = q,
        p = -q.  The Pippenger scan's hot combiner (ops/msm.py): table
        points are SRS powers (never infinity; pads use the generator with
        scalar 0)."""
        from .limb import _pallas_wanted
        x1 = p[0]
        if (_pallas_wanted() and x1.ndim >= 2 and x1.shape[-2] == self.F.L
                and x1.shape == q2[0].shape and x1.shape[-1] >= 128):
            from . import pallas_field as pf
            if x1.ndim == 2:
                return pf.ec_add_mixed(p, q2)
            lead = x1.shape[:-2]
            tail = x1.shape[-2:]
            fp = tuple(c.reshape((-1,) + tail) for c in p)
            fq_ = tuple(c.reshape((-1,) + tail) for c in q2)
            out = jax.vmap(pf.ec_add_mixed)(fp, fq_)
            return tuple(c.reshape(lead + tail) for c in out)
        return self._add_mixed_xla(p, q2)

    def _add_mixed_xla(self, p, q2):
        F = self.F
        x1, y1, z1 = p
        x2, y2 = q2

        t0 = F.mul(x1, x2)
        t1 = F.mul(y1, y2)
        t3 = F.mul(F.add(x1, y1), F.add(x2, y2))
        t3 = F.sub(t3, F.add(t0, t1))              # x1y2 + x2y1
        t4 = F.add(y1, F.mul(y2, z1))              # y1 + y2 z1
        y3 = F.add(x1, F.mul(x2, z1))              # x1 + x2 z1
        x3 = F.add(t0, t0)
        t0 = F.add(x3, t0)                         # 3 x1x2
        t2 = self._mul12(F, z1)                    # b3 z1
        z3 = F.add(t1, t2)
        t1 = F.sub(t1, t2)
        y3 = self._mul12(F, y3)                    # b3 (x1 + x2 z1)
        x3 = F.mul(t4, y3)
        t2 = F.mul(t3, t1)
        x3 = F.sub(t2, x3)
        y3 = F.mul(y3, t0)
        t1 = F.mul(t1, z3)
        y3 = F.add(t1, y3)
        t0 = F.mul(t0, t3)
        z3 = F.mul(z3, t4)
        z3 = F.add(z3, t0)
        return (x3, y3, z3)

    def double(self, p):
        return self.add(p, p)

    def neg(self, p):
        x, y, z = p
        return (x, self.F.neg(y), z)

    def select(self, cond, p, q):
        """cond (..., N) bool -> p or q, per lane."""
        F = self.F
        return tuple(F.select(cond, a, b) for a, b in zip(p, q))

    def identity_like(self, c):
        """Identity broadcast to the shape of component array c."""
        return tuple(jnp.broadcast_to(i, c.shape) for i in self.identity)

    def broadcast_identity(self, batch_shape, n: int = 1):
        """Identity as (batch_shape..., 24, n) components."""
        return tuple(
            jnp.broadcast_to(i, tuple(batch_shape) + (self.F.L, n))
            for i in self.identity)

    def tree_reduce(self, pts, axis: int = 0):
        """Sum points along a batch axis by halving (log-depth)."""
        pts = tuple(jnp.moveaxis(c, axis, 0) for c in pts)
        n = pts[0].shape[0]
        while n > 1:
            half = n // 2
            even = tuple(c[:half] for c in pts)
            odd = tuple(c[half:2 * half] for c in pts)
            s = self.add(even, odd)
            if n % 2:
                s = tuple(jnp.concatenate([a, c[2 * half:n]], axis=0)
                          for a, c in zip(s, pts))
                n = half + 1
            else:
                n = half
            pts = s
        return tuple(c[0] for c in pts)

    def lane_reduce(self, pts):
        """Sum points along the ELEMENT (minormost) axis by halving;
        (..., 24, N) -> (..., 24, 1)."""
        n = pts[0].shape[-1]
        while n > 1:
            half = n // 2
            even = tuple(c[..., :half] for c in pts)
            odd = tuple(c[..., half:2 * half] for c in pts)
            s = self.add(even, odd)
            if n % 2:
                s = tuple(jnp.concatenate([a, c[..., 2 * half:n]], axis=-1)
                          for a, c in zip(s, pts))
                n = half + 1
            else:
                n = half
            pts = s
        return pts


_g1 = None


def device_g1() -> DeviceG1:
    global _g1
    if _g1 is None:
        _g1 = DeviceG1()
    return _g1
