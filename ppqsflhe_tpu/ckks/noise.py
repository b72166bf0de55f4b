"""Noise-budget introspection (test/diagnostic tool).

OpenFHE exposes no noise accounting to the reference (its pipeline just
trusts Δ=2^40 at depth 2, SURVEY.md §2.3); production parameter tuning needs
it. Given the secret key (so: offline/test use only), measure the actual
coefficient-domain noise of a ciphertext against the exact encoding of the
expected plaintext, and report it as bits — the distance to the two failure
walls:

- decryption wall: noise_bits must stay ≪ log2(q0) − 1 (the message+noise
  must fit the last remaining modulus);
- precision wall:  slot error ≈ 2^{noise_bits − scale_bits} · √N.
"""

from __future__ import annotations

import math

import numpy as np

from ..core.rns import compose_centered
from .rlwe import decrypt_to_coeffs
from .types import Ciphertext, SecretKey


def noise_coeffs(sch, sk: SecretKey, ct: Ciphertext, expected_values) -> np.ndarray:
    """Exact noise polynomial e = (⟨ct, sk⟩ − encode(expected)) over Z,
    centered (object array of python ints)."""
    import jax

    coeffs = np.asarray(jax.device_get(decrypt_to_coeffs(sch.ctx, sk.s_eval, ct)))
    moduli = [sch.ctx.moduli_qp[i] for i in range(ct.nlimbs)]
    got = compose_centered(coeffs, moduli)
    want = sch.encoder.encode(expected_values, ct.scale)   # rounded ints (f64/obj)
    want = np.asarray([int(round(float(w))) for w in want], dtype=object)
    return got - want


def noise_bits(sch, sk: SecretKey, ct: Ciphertext, expected_values) -> float:
    """log2 of the max |noise coefficient| (0 coefficients → 0.0)."""
    e = noise_coeffs(sch, sk, ct, expected_values)
    m = max((abs(int(x)) for x in e.ravel()), default=0)
    return math.log2(m) if m > 0 else 0.0


def budget_report(sch, sk: SecretKey, ct: Ciphertext, expected_values) -> dict:
    """Noise bits + remaining decryption budget + predicted slot precision."""
    nb = noise_bits(sch, sk, ct, expected_values)
    q_last_bits = int(sch.ctx.moduli_qp[0]).bit_length()   # limb 0 survives all rescales
    scale_bits = math.log2(ct.scale) if ct.scale > 0 else 0.0
    return {
        "noise_bits": nb,
        "budget_bits": q_last_bits - 1 - nb,
        "scale_bits": scale_bits,
        "predicted_slot_error_log2": nb - scale_bits + 0.5 * math.log2(sch.params.n),
        "nlimbs": ct.nlimbs,
    }
