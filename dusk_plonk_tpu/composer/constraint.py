"""Width-4 TurboPlonk constraint record: 11 selector columns + 4 wires +
optional public input.

Mirrors `zksnarks::Constraint` as consumed by the reference composer
(builder methods at src/lib.rs:613-623, tag constructors at
src/lib.rs:322-326,503,547,841,1095; public fields listed at
src/key.rs:108-118).  Values are canonical Fr ints; wires are witness
indices (PrivateWire).  Instances are immutable; builders return copies,
matching the reference's by-value Constraint usage.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from ..fields.constants import R_MOD


def _fr(v) -> int:
    return int(v) % R_MOD


@dataclass(frozen=True)
class Constraint:
    q_m: int = 0
    q_l: int = 0
    q_r: int = 0
    q_o: int = 0
    q_c: int = 0
    q_d: int = 0          # a.k.a. q_4
    q_arith: int = 0
    q_range: int = 0
    q_logic: int = 0
    q_fixed_group_add: int = 0
    q_variable_group_add: int = 0
    w_a: int = 0          # default wires point at the ZERO witness
    w_b: int = 0
    w_o: int = 0
    w_d: int = 0
    public_input: int | None = None

    # -- selector builders (src/lib.rs:613-623 usage) -----------------------
    def mult(self, v): return replace(self, q_m=_fr(v))
    def left(self, v): return replace(self, q_l=_fr(v))
    def right(self, v): return replace(self, q_r=_fr(v))
    def output(self, v): return replace(self, q_o=_fr(v))
    def fourth(self, v): return replace(self, q_d=_fr(v))
    def constant(self, v): return replace(self, q_c=_fr(v))
    def public(self, v): return replace(self, public_input=_fr(v))

    # -- wire builders -------------------------------------------------------
    def a(self, w): return replace(self, w_a=int(w))
    def b(self, w): return replace(self, w_b=int(w))
    def o(self, w): return replace(self, w_o=int(w))
    def d(self, w): return replace(self, w_d=int(w))

    # -- gate-family tag constructors ----------------------------------------
    @staticmethod
    def arithmetic(c: "Constraint") -> "Constraint":
        return replace(c, q_arith=1)

    @staticmethod
    def range(c: "Constraint") -> "Constraint":
        return replace(c, q_range=1)

    @staticmethod
    def logic(c: "Constraint") -> "Constraint":
        """AND gate tag: q_logic = 1, q_c = +1. The sign convention is pinned
        numerically by the delta_xor_and identity over all 16 quad pairs
        (tests/test_widgets.py): q_c=+1 vanishes exactly on AND rows,
        q_c=-1 exactly on XOR rows."""
        return replace(c, q_logic=1, q_c=1)

    @staticmethod
    def logic_xor(c: "Constraint") -> "Constraint":
        """XOR gate tag: q_logic = 1, q_c = -1."""
        return replace(c, q_logic=1, q_c=R_MOD - 1)

    @staticmethod
    def group_add_curve_scalar(c: "Constraint") -> "Constraint":
        return replace(c, q_fixed_group_add=1)

    @staticmethod
    def group_add_curve_addtion(c: "Constraint") -> "Constraint":
        # (sic) — reference keeps this typo in the API (src/lib.rs:841)
        return replace(c, q_variable_group_add=1)
