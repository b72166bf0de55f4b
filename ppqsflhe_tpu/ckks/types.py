"""Scheme-level data types (JAX pytrees).

Conventions (mirror OpenFHE's at-rest layout, SURVEY.md §2.3):
- Ring elements are u64 residue stacks of shape (..., L_active, N), limb-major,
  stored in EVALUATION (NTT, bit-reversed) domain unless a name says _coeff.
- Ciphertexts are (k, L, N) with k components (k=2, or 3 pre-relinearize);
  component 0 is the "b"/constant part: Dec(ct) = sum_k ct[k] * s^k.
- `scale` is tracked exactly as a float (FLEXIBLEAUTO-style scale management);
  it is pytree *metadata*, so a handful of distinct scales specialize jit
  compilations rather than being traced.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

import jax
import numpy as np


@jax.tree_util.register_dataclass
@dataclass
class Ciphertext:
    data: jax.Array                  # u64[k, L_active, N], eval domain
    scale: float = field(metadata=dict(static=True), default=2.0**40)

    @property
    def num_components(self) -> int:
        return self.data.shape[0]

    @property
    def nlimbs(self) -> int:
        return self.data.shape[1]

    def with_data(self, data) -> "Ciphertext":
        return replace(self, data=data)


@jax.tree_util.register_dataclass
@dataclass
class Plaintext:
    data: jax.Array                  # u64[L_active, N], eval domain
    scale: float = field(metadata=dict(static=True), default=2.0**40)

    @property
    def nlimbs(self) -> int:
        return self.data.shape[0]


@jax.tree_util.register_dataclass
@dataclass
class SecretKey:
    s_eval: jax.Array                # u64[L+K, N] over full QP basis
    # host-side ternary coefficients (never shipped to device ops); kept for
    # serialization and for re-deriving eval forms under new bases.
    s_int: np.ndarray = field(metadata=dict(static=False), default=None)


@jax.tree_util.register_dataclass
@dataclass
class PublicKey:
    data: jax.Array                  # u64[2, L+K, N]: (b, a), b = -a*s + e


@jax.tree_util.register_dataclass
@dataclass
class KeySwitchKey:
    """Hybrid key-switch key: for each digit j, an encryption-like pair
    (b_j, a_j) over QP with b_j = -a_j*s_to + e_j + P*g_j*target.

    ``mont=True`` marks the residues as Montgomery-form (k·2^64 mod q):
    the key-switch inner product then needs ONE mont_mul per element
    instead of two (eval.ksk_to_mont) — keys are long-lived, so the one
    conversion pass amortizes across every ciphertext they switch."""

    data: jax.Array                  # u64[ndigits, 2, L+K, N]
    mont: bool = field(metadata=dict(static=True), default=False)

    @property
    def ndigits(self) -> int:
        return self.data.shape[0]


@jax.tree_util.register_dataclass
@dataclass
class EvalKey:
    """Bundle of evaluation keys (relinearization + rotation keys)."""

    relin: KeySwitchKey | None = None
    rotations: dict = field(default_factory=dict)  # rot index -> KeySwitchKey
