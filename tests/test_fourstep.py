"""Four-step NTT + u32-pair arithmetic tests (ops/)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ppqsflhe_tpu.core import primes
from ppqsflhe_tpu.core.ntt import NttBasis
from ppqsflhe_tpu.ops import u32pair as up
from ppqsflhe_tpu.ops.pallas_ntt import FourStepNtt


def pairs(vals):
    v = np.asarray(vals, np.uint64)
    return jnp.asarray(v & np.uint64(0xFFFFFFFF), jnp.uint32), jnp.asarray(v >> np.uint64(32), jnp.uint32)


def join(lo, hi):
    return np.asarray(lo, np.uint64) | (np.asarray(hi, np.uint64) << np.uint64(32))


Q = 1152921504606748673  # the reference 60-bit modulus


def test_u32pair_mul64_wide():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 64, 256, dtype=np.uint64)
    b = rng.integers(0, 1 << 64, 256, dtype=np.uint64)
    alo, ahi = pairs(a)
    blo, bhi = pairs(b)
    w0, w1, w2, w3 = up.mul64_wide(alo, ahi, blo, bhi)
    for i in range(256):
        want = int(a[i]) * int(b[i])
        got = (int(w0[i]) | (int(w1[i]) << 32) | (int(w2[i]) << 64) | (int(w3[i]) << 96))
        assert got == want, i


def test_u32pair_modops():
    rng = np.random.default_rng(1)
    a = rng.integers(0, Q, 512, dtype=np.uint64)
    b = rng.integers(0, Q, 512, dtype=np.uint64)
    alo, ahi = pairs(a)
    blo, bhi = pairs(b)
    qlo, qhi = jnp.uint32(Q & 0xFFFFFFFF), jnp.uint32(Q >> 32)
    slo, shi = up.modadd64(alo, ahi, blo, bhi, qlo, qhi)
    assert (join(slo, shi).astype(object) == (a.astype(object) + b) % Q).all()
    dlo, dhi = up.modsub64(alo, ahi, blo, bhi, qlo, qhi)
    assert (join(dlo, dhi).astype(object) == (a.astype(object) - b) % Q).all()


def test_u32pair_shoup():
    rng = np.random.default_rng(2)
    a = rng.integers(0, Q, 512, dtype=np.uint64)
    w = int(rng.integers(0, Q))
    ws = primes.shoup_precompute(w, Q)
    alo, ahi = pairs(a)
    wlo, whi = jnp.uint32(w & 0xFFFFFFFF), jnp.uint32(w >> 32)
    wslo, wshi = jnp.uint32(ws & 0xFFFFFFFF), jnp.uint32(ws >> 32)
    qlo, qhi = jnp.uint32(Q & 0xFFFFFFFF), jnp.uint32(Q >> 32)
    rlo, rhi = up.shoup_mul64(alo, ahi, wlo, whi, wslo, wshi, qlo, qhi)
    assert (join(rlo, rhi).astype(object) == (a.astype(object) * w) % Q).all()


def test_u32pair_montmul():
    rng = np.random.default_rng(3)
    a = rng.integers(0, Q, 512, dtype=np.uint64)
    b = rng.integers(0, Q, 512, dtype=np.uint64)
    qinv = primes.mont_qinv_neg(Q)
    alo, ahi = pairs(a)
    blo, bhi = pairs(b)
    qlo, qhi = jnp.uint32(Q & 0xFFFFFFFF), jnp.uint32(Q >> 32)
    ilo, ihi = jnp.uint32(qinv & 0xFFFFFFFF), jnp.uint32(qinv >> 32)
    rlo, rhi = up.mont_mul64(alo, ahi, blo, bhi, qlo, qhi, ilo, ihi)
    rinv = primes.mod_inverse(1 << 64, Q)
    want = (a.astype(object) * b % Q) * rinv % Q
    assert (join(rlo, rhi).astype(object) == want).all()


@pytest.fixture(scope="module")
def setup():
    n = 256
    moduli = [Q, primes.first_prime_down(40, 2 * n)]
    psis = [primes.root_of_unity(2 * n, q) for q in moduli]
    basis = NttBasis(n, moduli, psis)
    fs = FourStepNtt(n, moduli, psis)
    rng = np.random.default_rng(4)
    x = np.stack([rng.integers(0, q, n, dtype=np.uint64) for q in moduli])
    return n, moduli, basis, fs, x


def test_fourstep_roundtrip(setup):
    n, moduli, basis, fs, x = setup
    fwd = fs.ntt(jnp.asarray(x), implementation="xla")
    back = np.asarray(fs.intt(fwd, implementation="xla"))
    assert (back == x).all()


def test_fourstep_matches_core_ntt(setup):
    """kernel order → std order permutation must land exactly on core/ntt.py."""
    n, moduli, basis, fs, x = setup
    fwd = np.asarray(fs.ntt(jnp.asarray(x), implementation="xla"))
    std = np.asarray(basis.ntt(jnp.asarray(x)))
    remapped = fwd[:, fs.perm_to_std]
    assert (remapped == std).all()


def test_fourstep_batched(setup):
    n, moduli, basis, fs, x = setup
    xb = np.stack([x, (x + 1) % np.asarray(moduli, np.uint64)[:, None]])
    fwd = fs.ntt(jnp.asarray(xb), implementation="xla")
    back = np.asarray(fs.intt(fwd, implementation="xla"))
    assert (back == xb).all()


def test_pallas_interpret_matches_xla(setup):
    """Pallas kernel in interpreter mode == the XLA fallback bit-for-bit."""
    from jax.experimental.pallas import tpu as pltpu

    n, moduli, basis, fs, x = setup
    with pltpu.force_tpu_interpret_mode():
        fwd_p = np.asarray(fs.ntt(jnp.asarray(x), implementation="pallas"))
    fwd_x = np.asarray(fs.ntt(jnp.asarray(x), implementation="xla"))
    assert (fwd_p == fwd_x).all()
    with pltpu.force_tpu_interpret_mode():
        back_p = np.asarray(fs.intt(jnp.asarray(fwd_x), implementation="pallas"))
    assert (back_p == x).all()


def test_mxu_backend_bitexact():
    """The int8 digit-matmul MXU backend (ops/mxu_ntt.py) is bit-exact
    interchangeable with the four-step XLA path (same kernel eval order),
    for strict AND Harvey-lazy (< 4q) inputs, across modulus widths
    (60/40/20-bit: redc and fallback recompose plans)."""
    import jax.numpy as jnp
    import numpy as np

    from ppqsflhe_tpu.core import primes
    from ppqsflhe_tpu.core.ntt import NttBasis
    from ppqsflhe_tpu.ops.mxu_ntt import MxuNttTables, mxu_intt_limb, mxu_ntt_limb
    from ppqsflhe_tpu.ops.pallas_ntt import FourStepNtt

    n = 256
    moduli = ([primes.first_prime_down(60, 2 * n)]
              + primes.prime_chain(40, 2, 2 * n)
              + [primes.next_prime_up(1 << 19, 2 * n)])
    basis = NttBasis(n, tuple(moduli))
    fs = FourStepNtt(n, moduli, basis.psis)
    tabs = [MxuNttTables.build(n, q, int(p)) for q, p in zip(moduli, basis.psis)]
    rng = np.random.default_rng(7)
    x = np.stack([rng.integers(0, q, size=(3, n), dtype=np.uint64)
                  for q in moduli], axis=1)
    ref = np.asarray(fs.ntt(jnp.asarray(x), implementation="xla"))
    out = np.stack([np.asarray(mxu_ntt_limb(jnp.asarray(x[:, i]), tabs[i]))
                    for i in range(len(moduli))], axis=1)
    assert np.array_equal(ref, out)
    # inverse + roundtrip
    iout = np.stack([np.asarray(mxu_intt_limb(jnp.asarray(ref[:, i]), tabs[i]))
                     for i in range(len(moduli))], axis=1)
    assert np.array_equal(iout, x)
    # lazy inputs (residues + q, the Harvey invariant) give identical output
    x4 = x + np.array(moduli, np.uint64)[None, :, None]
    out4 = np.stack([np.asarray(mxu_ntt_limb(jnp.asarray(x4[:, i]), tabs[i]))
                     for i in range(len(moduli))], axis=1)
    assert np.array_equal(out4, out)
    # dispatch through FourStepNtt (the scheme integration point)
    via = np.asarray(fs.ntt(jnp.asarray(x), implementation="mxu"))
    assert np.array_equal(via, ref)
    via_i = np.asarray(fs.intt(jnp.asarray(ref), implementation="mxu"))
    assert np.array_equal(via_i, x)


def test_pallas_mxu_kernel_bitexact_interpret():
    """The fused Pallas MXU kernel (ops/pallas_mxu_ntt.py) is bit-exact vs
    the XLA four-step path, in Pallas interpret mode (the TPU compile path
    is exercised by bench_kernels.py on hardware). Covers forward, inverse
    and limb-subset calls across 60/40/20-bit moduli (uniform redc/4)."""
    import jax.numpy as jnp
    import numpy as np

    from ppqsflhe_tpu.core import primes
    from ppqsflhe_tpu.core.ntt import NttBasis
    from ppqsflhe_tpu.ops.pallas_mxu_ntt import PallasMxuNtt
    from ppqsflhe_tpu.ops.pallas_ntt import FourStepNtt

    n = 256
    moduli = ([primes.first_prime_down(60, 2 * n)]
              + primes.prime_chain(40, 2, 2 * n)
              + [primes.next_prime_up(1 << 19, 2 * n)])
    basis = NttBasis(n, tuple(moduli))
    fs = FourStepNtt(n, moduli, basis.psis)
    pm = PallasMxuNtt(n, moduli, basis.psis)
    rng = np.random.default_rng(11)
    x = np.stack([rng.integers(0, q, size=(3, n), dtype=np.uint64)
                  for q in moduli], axis=1)
    ref = np.asarray(fs.ntt(jnp.asarray(x), implementation="xla"))
    out = np.asarray(pm.ntt(jnp.asarray(x), interpret=True))
    assert np.array_equal(out, ref)
    iout = np.asarray(pm.intt(jnp.asarray(ref), interpret=True))
    assert np.array_equal(iout, x)
    sub = np.asarray(pm.ntt(jnp.asarray(x[:, :2]), idx=(0, 1), interpret=True))
    assert np.array_equal(sub, ref[:, :2])


def test_pallas_mxu_big_bitexact_interpret():
    """The streamed two-kernel variant for N>2^15 (PallasMxuNttBig,
    VERDICT r3 #1) is bit-exact vs the xla four-step path and satisfies
    intt(ntt(x)) == x, including on limb subsets (interpret mode)."""
    import jax.numpy as jnp

    from ppqsflhe_tpu.core import primes
    from ppqsflhe_tpu.ops.pallas_mxu_ntt import PallasMxuNttBig
    from ppqsflhe_tpu.ops.pallas_ntt import FourStepNtt

    n, L, B = 1 << 10, 3, 2
    moduli = [primes.first_prime_down(59, 2 * n)] + primes.prime_chain(40, 2, 2 * n)
    psis = [primes.root_of_unity(2 * n, q) for q in moduli]
    fs = FourStepNtt(n, moduli, psis)
    big = PallasMxuNttBig(n, moduli, psis, blk=16)
    rng = np.random.default_rng(3)
    x = jnp.asarray(np.stack([
        np.stack([rng.integers(0, q, n, dtype=np.uint64) for q in moduli])
        for _ in range(B)
    ]))
    want = fs.ntt(x, implementation="xla")
    got = big.ntt(x, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    back = big.intt(got, interpret=True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    got2 = big.ntt(x[:, :2], idx=(0, 1), interpret=True)
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(want[:, :2]))


def test_pallas_mxu_group_routing_bitexact(monkeypatch):
    """Per-group fused/streamed routing (r5, VERDICT r4 #2): with a tiny
    VMEM budget the nd=9 (60-bit) group streams through the two-kernel
    pair while the nd=6 group stays fused — outputs bit-exact vs xla and
    vs the all-fused runner."""
    import jax.numpy as jnp

    from ppqsflhe_tpu.core import primes
    from ppqsflhe_tpu.ops import pallas_mxu_ntt as PMX
    from ppqsflhe_tpu.ops.pallas_ntt import FourStepNtt

    n = 256
    moduli = ([primes.first_prime_down(60, 2 * n)]
              + primes.prime_chain(40, 2, 2 * n))
    psis = [primes.root_of_unity(2 * n, q) for q in moduli]
    fs = FourStepNtt(n, moduli, psis)
    pm = PMX.PallasMxuNtt(n, moduli, psis)
    # budget sized so ONLY the 40-bit (smaller-nd) group fits
    fits = sorted(set(pm._nd_of))
    assert len(fits) == 2, pm._nd_of
    lo_nd, hi_nd = fits
    mats = lambda nd: 2 * ((nd * pm.n1) ** 2 + (nd * pm.n2) ** 2 + 8 * n * 4)
    pm._vmem_budget = (mats(lo_nd) + mats(hi_nd)) // 2
    assert pm._group_fits(lo_nd) and not pm._group_fits(hi_nd)

    rng = np.random.default_rng(5)
    x = jnp.asarray(np.stack([
        np.stack([rng.integers(0, q, n, dtype=np.uint64) for q in moduli])
        for _ in range(2)
    ]))
    want = fs.ntt(x, implementation="xla")
    got = pm.ntt(x, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert pm._big is not None            # the streamed delegate engaged
    back = pm.intt(got, interpret=True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_pallas_mxu_mont_twiddle_bitexact(monkeypatch):
    """The 2-table Montgomery-twiddle fused variant (late r5: fits the
    nd=6 group at N=2^16 into the default VMEM scope) is bit-exact vs the
    4-table Shoup-quad kernel and the xla path, forward and inverse."""
    import jax.numpy as jnp

    from ppqsflhe_tpu.core import primes
    from ppqsflhe_tpu.ops import pallas_mxu_ntt as PMX
    from ppqsflhe_tpu.ops.pallas_ntt import FourStepNtt

    n = 256
    moduli = ([primes.first_prime_down(60, 2 * n)]
              + primes.prime_chain(40, 2, 2 * n))
    psis = [primes.root_of_unity(2 * n, q) for q in moduli]
    fs = FourStepNtt(n, moduli, psis)
    pm = PMX.PallasMxuNtt(n, moduli, psis)
    # force EVERY group onto the mont path: shoup never fits, mont always
    monkeypatch.setattr(
        PMX.PallasMxuNtt, "_group_fits",
        lambda self, nd, twiddle_planes=4: twiddle_planes == 2)

    rng = np.random.default_rng(7)
    x = jnp.asarray(np.stack([
        np.stack([rng.integers(0, q, n, dtype=np.uint64) for q in moduli])
        for _ in range(2)
    ]))
    want = fs.ntt(x, implementation="xla")
    got = pm.ntt(x, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    back = pm.intt(got, interpret=True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
