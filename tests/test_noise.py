"""Noise-budget introspection tests (ckks/noise.py)."""

import numpy as np
import jax
import pytest

from ppqsflhe_tpu.ckks.noise import budget_report, noise_bits
from ppqsflhe_tpu.ckks.params import CkksParams
from ppqsflhe_tpu.ckks.scheme import CkksScheme


@pytest.fixture(scope="module")
def sch():
    return CkksScheme(CkksParams.generate(n=256, mult_depth=2, scale_bits=40, dnum=2))


def test_fresh_ciphertext_noise(sch):
    sk, pk = sch.keygen(jax.random.PRNGKey(0))
    v = np.random.default_rng(0).uniform(-1, 1, sch.encoder.slots)
    ct = sch.encrypt_values(pk, v, jax.random.PRNGKey(1))
    nb = noise_bits(sch, sk, ct, v)
    # fresh RLWE noise at sigma=3.19, N=256: a handful of bits, far below Δ
    assert 0 < nb < 25, nb
    rep = budget_report(sch, sk, ct, v)
    assert rep["budget_bits"] > 30
    assert rep["nlimbs"] == sch.params.num_q
    # predicted slot error consistent with the actual decrypt error
    err = float(np.abs(sch.decrypt(sk, ct) - v).max())
    assert err < 2.0 ** (rep["predicted_slot_error_log2"] + 4)


def test_noise_grows_through_the_server_round(sch):
    """PRE + FedAvg adds key-switch noise but stays far from both walls —
    the quantitative version of the pipeline's correctness claim."""
    sk1, pk1 = sch.keygen(jax.random.PRNGKey(10))
    sk2, pk2 = sch.keygen(jax.random.PRNGKey(11))
    rk12 = sch.rekey_gen(sk1, pk2, jax.random.PRNGKey(12))
    rng = np.random.default_rng(1)
    v1 = rng.uniform(-1, 1, sch.encoder.slots)
    v2 = rng.uniform(-1, 1, sch.encoder.slots)
    ct1 = sch.encrypt_values(pk1, v1, jax.random.PRNGKey(13))
    ct2 = sch.encrypt_values(pk2, v2, jax.random.PRNGKey(14))
    fresh = noise_bits(sch, sk2, ct2, v2)
    agg = sch.mult_scalar(sch.add(sch.re_encrypt(ct1, rk12), ct2), 0.5)
    rep = budget_report(sch, sk2, agg, (v1 + v2) / 2)
    assert rep["noise_bits"] > 0
    assert rep["budget_bits"] > 20, rep    # nowhere near decryption failure
    # rescale divided the key-switch noise back down: total stays small
    assert rep["noise_bits"] < fresh + 25, (rep, fresh)


def test_cdt_sampler_exact_distribution():
    """discrete_gaussian is an exact CDT sampler (VERDICT r4 weak #7): the
    table's implied pmf matches rho_k = exp(-k^2/2sigma^2) to float64
    round-off, samples are integral/symmetric/in-tail, and the empirical
    pmf matches the table at chi-square scale."""
    from ppqsflhe_tpu.core import sampling

    sigma = sampling.SIGMA
    thr = sampling._cdt_thresholds(sigma)
    assert 25 < len(thr) < 40                     # ~10*sigma magnitudes
    edges = np.concatenate([[0.0], thr.astype(np.float64), [2.0 ** 64]])
    p_table = np.diff(edges) / 2.0 ** 64
    ks = np.arange(len(thr) + 1, dtype=np.float64)
    rho = np.exp(-(ks ** 2) / (2 * sigma ** 2))
    rho[0] /= 2
    rho /= rho.sum()
    assert np.abs(p_table - rho).max() < 1e-15

    x = np.asarray(sampling.discrete_gaussian(jax.random.PRNGKey(3), 200_000))
    assert x.dtype == np.int32
    assert np.abs(x).max() <= len(thr)            # tail cut respected
    assert abs(x.mean()) < 0.05                   # symmetric
    assert abs(x.std() - sigma) < 0.05            # right scale
    # empirical signed pmf vs theory at a few central values (5-sigma bands)
    n = x.size
    for k in (0, 1, -1, 2, -2, 3, -3):
        p = rho[abs(k)] if k == 0 else rho[abs(k)] / 2
        emp = np.mean(x == k)
        assert abs(emp - p) < 5 * np.sqrt(p * (1 - p) / n), (k, emp, p)
