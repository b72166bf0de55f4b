"""RLWE noise and key sampling (jax.random, functional keys).

Replaces OpenFHE's DiscreteGaussianGenerator / TernaryUniformGenerator
(SURVEY.md §2.2 — secret distribution ternary, error sigma = 3.19). Samplers
return small signed integers (int32) plus helpers to map them into an RNS
residue stack; uniform ring elements are sampled directly per-limb (the CRT
bijection makes independent per-limb uniforms exactly uniform over Z_Q).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .modarith import U64

SIGMA = 3.19  # OpenFHE default CKKS error std-dev (SURVEY.md §2.3, dp=3.19)


def ternary(key, n: int) -> jnp.ndarray:
    """Uniform ternary secret in {-1, 0, 1}^n (int32)."""
    return jax.random.randint(key, (n,), -1, 2, dtype=jnp.int32)


def discrete_gaussian(key, n: int, sigma: float = SIGMA) -> jnp.ndarray:
    """Rounded continuous Gaussian — statistically close to discrete Gaussian
    at this sigma for INDCPA purposes."""
    return jnp.round(jax.random.normal(key, (n,), dtype=jnp.float32) * sigma).astype(jnp.int32)


def uniform_signed(key, n: int, bits: int) -> jnp.ndarray:
    """Uniform flooding noise in [-2^bits, 2^bits] (int64 lanes) — the
    noise-flooding primitive behind threshold-decryption smudging and
    HRA-secure (INDCCA PREMode) re-encryption re-randomization."""
    if bits <= 0:
        return jnp.zeros((n,), jnp.int64)
    bound = 1 << bits
    return jax.random.randint(key, (n,), -bound, bound + 1, dtype=jnp.int64)


def uniform_rns(key, moduli: Sequence[int], n: int) -> jnp.ndarray:
    """Uniform element of R_Q in RNS form: u64[L, n], limb i uniform [0, q_i)."""
    keys = jax.random.split(key, len(moduli))
    limbs = [
        jax.random.randint(k, (n,), 0, int(q), dtype=jnp.int64).astype(U64)
        for k, q in zip(keys, moduli)
    ]
    return jnp.stack(limbs, axis=0)


def signed_to_rns(v: jnp.ndarray, moduli: Sequence[int]) -> jnp.ndarray:
    """Small signed ints int32[n] → residues u64[L, n]."""
    q = jnp.asarray(np.array(moduli, np.uint64).reshape(len(moduli), 1), U64)
    v64 = v.astype(jnp.int64)[None, :]
    return jnp.where(v64 < 0, q - (-v64).astype(U64), v64.astype(U64))
