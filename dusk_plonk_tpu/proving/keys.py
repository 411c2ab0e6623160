"""Key compilation: circuit -> (Prover, Verifier).

Behavioral port of reference src/key.rs (PlonkKey::compile_with_circuit):
pad to n = next_pow2(m), trim SRS, iFFT 11 selector columns, build 4 sigma
polynomials, commit 15 polynomials, precompute all 8n-coset evaluation
tables and the coset vanishing polynomial.

On TPU this is a one-time preprocessing job; the host version here is the
oracle, the device engine accelerates the 8n tables through ops/ntt.py when
`engine='jax'`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..fields.constants import R_MOD
from ..fields.host import fr_batch_inv
from ..poly.domain import Domain
from ..composer.composer import Plonk
from ..transcript.plonk_transcript import PlonkTranscript

SELECTOR_NAMES = ("q_m", "q_l", "q_r", "q_o", "q_c", "q_4", "q_arith",
                  "q_range", "q_logic", "q_fixed_group_add",
                  "q_variable_group_add")
SIGMA_NAMES = ("s_sigma_1", "s_sigma_2", "s_sigma_3", "s_sigma_4")


def next_pow2(x: int) -> int:
    return 1 << max(x - 1, 0).bit_length() if x > 1 else 1


@dataclass
class VerificationKey:
    """Reference VerificationKey fields at src/key.rs:203-214 (n stores the
    raw constraint count m; callers pad: src/prover/proof.rs:180)."""
    n: int
    n_inv: int
    generator: int
    generator_inv: int
    commitments: dict  # name -> G1 affine

    def to_bytes(self) -> bytes:
        """SCALE layout: n (u64 LE) ++ n_inv/generator/generator_inv
        (32B Montgomery Fr) ++ 15 G1Affine(97B) in selector+sigma order."""
        from .proof import _fr_scale, _g1_scale
        out = [self.n.to_bytes(8, "little"),
               _fr_scale(self.n_inv), _fr_scale(self.generator),
               _fr_scale(self.generator_inv)]
        out.extend(_g1_scale(self.commitments[name])
                   for name in SELECTOR_NAMES + SIGMA_NAMES)
        return b"".join(out)

    @classmethod
    def from_bytes(cls, data: bytes) -> "VerificationKey":
        from .proof import _fr_unscale, _g1_unscale
        if len(data) != 8 + 3 * 32 + 15 * 97:
            raise ValueError(f"bad VerificationKey length {len(data)}")
        n = int.from_bytes(data[0:8], "little")
        n_inv = _fr_unscale(data[8:40])
        generator = _fr_unscale(data[40:72])
        generator_inv = _fr_unscale(data[72:104])
        commitments = {}
        off = 104
        for name in SELECTOR_NAMES + SIGMA_NAMES:
            commitments[name] = _g1_unscale(data[off:off + 97])
            off += 97
        return cls(n=n, n_inv=n_inv, generator=generator,
                   generator_inv=generator_inv, commitments=commitments)


@dataclass
class ProvingKey:
    """Reference ProvingKey at src/key.rs:293-302: per-family
    (coefficients, 8n-coset evaluations) pairs plus the linear polynomial's
    coset evaluations and v_h_coset_8n (we also precompute its inverse —
    the reference inverts per-element in the quotient loop,
    src/prover/quotient_poly.rs:111; batch inversion is strictly better)."""
    n: int
    domain: Domain
    domain_8n: Domain
    selector_polys: dict          # name -> coeff list (len n)
    sigma_polys: list             # 4 coeff lists
    selector_evals_8n: dict       # name -> eval list (len 8n)
    sigma_evals_8n: list          # 4 eval lists
    linear_evals_8n: list         # coset evals of X
    v_h_coset_8n: list
    v_h_coset_8n_inv: list


def compile_circuit(params, circuit, label: bytes = b"plonk"):
    """PlonkKey::compile_with_circuit (reference src/key.rs:63-327)."""
    from .prover import Prover
    from .verifier import Verifier

    cs = Plonk.initialize()
    circuit.synthesize(cs)

    m = cs.m()
    n = next_pow2(m)
    k = n.bit_length() - 1
    additional_n = next_pow2(m + 6)
    trimmed = params.trim(additional_n)
    domain = Domain(k)

    # selector columns, zero-padded to n
    columns = {name: [0] * n for name in SELECTOR_NAMES}
    for i, c in enumerate(cs.constraints):
        columns["q_m"][i] = c.q_m
        columns["q_l"][i] = c.q_l
        columns["q_r"][i] = c.q_r
        columns["q_o"][i] = c.q_o
        columns["q_c"][i] = c.q_c
        columns["q_4"][i] = c.q_d
        columns["q_arith"][i] = c.q_arith
        columns["q_range"][i] = c.q_range
        columns["q_logic"][i] = c.q_logic
        columns["q_fixed_group_add"][i] = c.q_fixed_group_add
        columns["q_variable_group_add"][i] = c.q_variable_group_add

    selector_polys = {name: domain.idft(col) for name, col in columns.items()}
    sigma_polys = cs.perm.compute_sigma_polynomials(n, domain)

    commitments = {}
    for name in SELECTOR_NAMES:
        commitments[name] = trimmed.commit(selector_polys[name])
    for name, poly in zip(SIGMA_NAMES, sigma_polys):
        commitments[name] = trimmed.commit(poly)

    verifier_key = VerificationKey(
        n=m,
        n_inv=domain.size_inv,
        generator=domain.generator,
        generator_inv=domain.generator_inv,
        commitments=commitments,
    )

    # 8n coset tables ("blinding makes 4n insufficient", src/key.rs:216-222)
    x8n = next_pow2(8 * n)
    domain_8n = Domain(x8n.bit_length() - 1)
    selector_evals_8n = {name: domain_8n.coset_dft(poly)
                         for name, poly in selector_polys.items()}
    sigma_evals_8n = [domain_8n.coset_dft(p) for p in sigma_polys]
    linear_evals_8n = domain_8n.coset_dft([0, 1])
    v_h = domain_8n.compute_vanishing_poly_over_coset(n)
    v_h_inv = fr_batch_inv(v_h)

    prover_key = ProvingKey(
        n=n,
        domain=domain,
        domain_8n=domain_8n,
        selector_polys=selector_polys,
        sigma_polys=sigma_polys,
        selector_evals_8n=selector_evals_8n,
        sigma_evals_8n=sigma_evals_8n,
        linear_evals_8n=linear_evals_8n,
        v_h_coset_8n=v_h,
        v_h_coset_8n_inv=v_h_inv,
    )

    prover = Prover(label, trimmed, prover_key, verifier_key, n, m)
    verifier = Verifier(label, verifier_key, trimmed.verification_key(),
                        cs.public_input_indexes(), n, m)
    return prover, verifier


def compile_circuit_device(params, circuit, label: bytes = b"plonk"):
    """Device key compilation: the one-time preprocessing job on TPU
    (reference src/key.rs:63-327 — 11 selector iFFTs, 4 sigma iFFTs and 15
    MSM commits all run as batched device kernels; the 8n coset tables are
    then built lazily by DeviceEngine).  Returns (prover-with-engine,
    verifier); the prover's host oracle path is unavailable (the ProvingKey
    carries no host tables)."""
    from .prover import Prover
    from .verifier import Verifier
    from .engine import DeviceEngine

    import numpy as np
    import jax
    import jax.numpy as jnp
    from ..fields.constants import PERM_K1, PERM_K2, PERM_K3
    from ..fields.host import fr_root_of_unity
    from ..ops.limb import fr_field
    from ..ops.ntt import ntt_plan
    from ..ops.ec import device_g1
    from ..ops.msm import MsmPlan
    from ..utils.tracing import tracer

    with tracer.span("compile.synthesize"):
        cs = Plonk.initialize()
        circuit.synthesize(cs)

    m = cs.m()
    n = next_pow2(m)
    k = n.bit_length() - 1
    trimmed = params.trim(next_pow2(m + 6))
    domain = Domain(k)
    x8n = next_pow2(8 * n)
    domain_8n = Domain(x8n.bit_length() - 1)

    F = fr_field()
    G1 = device_g1()
    plan = ntt_plan(k)

    with tracer.span("compile.pack_selectors"):
        flat = []
        for name in SELECTOR_NAMES:
            attr = {"q_4": "q_d"}.get(name, name)
            col = [getattr(c, attr) for c in cs.constraints]
            flat.extend(col + [0] * (n - len(col)))
        cols = F.pack(flat, shape=(11, n))

    with tracer.span("compile.sigmas"):
        sigmas = cs.perm.compute_sigma_permutations(n)
    col_idx = jnp.asarray(np.array(
        [[c for (c, g) in s] for s in sigmas], np.int32))     # (4, n)
    gate_idx = jnp.asarray(np.array(
        [[g for (c, g) in s] for s in sigmas], np.int32))
    ks = F.pack([1, PERM_K1, PERM_K2, PERM_K3])               # (L, 4)
    ns = trimmed.n_powers()
    # domain roots from host power tables (a traced power scan at 2^16+
    # costs minutes of remote XLA compile; this is one broadcast mul)
    roots_arg = F.powers_host_base(fr_root_of_unity(k), n)

    @jax.jit
    def build(cols, col_idx, gate_idx, roots, tw_inv, s_one, s_ninv):
        # twiddle/scale tables ride as ARGS: closure-captured they embed
        # as HLO constants — the stacked (k, L, n) table is 302 MB at
        # k=18 and the remote compile service rejects the module (HTTP
        # 413, measured)
        sel_polys = plan._transform(cols, tw_inv, s_one, s_ninv)
        sig_lagrange = F.mul(
            jnp.moveaxis(ks[:, col_idx], 0, 1),               # (4, L, n)
            jnp.moveaxis(roots[:, gate_idx], 0, 1))
        sigma_polys = plan._transform(sig_lagrange, tw_inv, s_one, s_ninv)
        all15 = jnp.concatenate([sel_polys, sigma_polys], axis=0)
        canon = jnp.zeros((15, F.L, ns), jnp.uint32).at[:, :, :n].set(
            F.from_mont(all15))
        return sel_polys, sigma_polys, canon

    with tracer.span("compile.build_polys"):
        sel_polys, sigma_polys, canon = build(
            cols, col_idx, gate_idx, roots_arg,
            plan.tw_inv, plan.scale_one, plan.scale_n_inv)
        canon.block_until_ready()

    with tracer.span("compile.pack_srs"):
        if trimmed.packed is not None:
            srs = tuple(jnp.asarray(c) for c in trimmed.packed)
        else:
            srs = G1.pack_points(trimmed.powers)
        msm = MsmPlan(ns)
    with tracer.span("compile.commit15"):
        pts = msm.msm_affine_batch(srs, canon)
    commitments = dict(zip(SELECTOR_NAMES + SIGMA_NAMES, pts))

    verifier_key = VerificationKey(
        n=m, n_inv=domain.size_inv, generator=domain.generator,
        generator_inv=domain.generator_inv, commitments=commitments)
    prover_key = ProvingKey(
        n=n, domain=domain, domain_8n=domain_8n,
        selector_polys=None, sigma_polys=None, selector_evals_8n=None,
        sigma_evals_8n=None, linear_evals_8n=None, v_h_coset_8n=None,
        v_h_coset_8n_inv=None)

    prover = Prover(label, trimmed, prover_key, verifier_key, n, m)
    with tracer.span("compile.engine_init"):
        prover.use_device_engine(DeviceEngine(
            prover, sel_polys=sel_polys, sigma_polys=sigma_polys,
            srs=srs, msm=msm, wire_plan=DeviceEngine.build_wire_plan(cs, n)))
    verifier = Verifier(label, verifier_key, trimmed.verification_key(),
                        cs.public_input_indexes(), n, m)
    return prover, verifier
