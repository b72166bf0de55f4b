"""Four-step negacyclic NTT — the TPU-shaped factorization.

The stage-unrolled radix-2 NTT in core/ntt.py ends with butterflies at
stride 1: on TPU those land in the 128-wide lane dimension and waste the
VPU. The four-step factorization N = n1·n2 (n1=n2=√N, both ≥ 64) keeps every
butterfly full-lane:

    y = x ⊙ ψ^j                       (negacyclic twist)
    A = GS-NTT_{n1} over columns      (strides hit the sublane dim only)
    B = A ⊙ T,  T[r][j2] = ω^{rev(r)·j2}   (elementwise twiddle)
    C = GS-NTT_{n2} over columns of Bᵀ     (one 128×128-tile transpose)

Output order is the kernel-native order u = rev(k2)·n1 + rev(k1) for
evaluation index k = k2·n1 + k1; ``kernel_to_std`` maps it to the standard
bit-reversed order of core/ntt.py (pointwise ops are order-agnostic, so the
permutation is only applied at interop boundaries).

The transform body is pure jnp over u32 (lo, hi) pairs (ops/u32pair.py), so
the SAME code runs (a) inside the Pallas kernel (ops/pallas_ntt.py), (b) as
a plain-XLA fallback, and (c) under CPU tests.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np

from ..core import primes
from ..core.ntt import bit_reverse_indices
from . import u32pair as up


def _split_np(x64: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    return (x64 & np.uint64(0xFFFFFFFF)).astype(np.uint32), (x64 >> np.uint64(32)).astype(np.uint32)


def _shoup_np(w: np.ndarray, q: int) -> np.ndarray:
    return np.array([(int(x) << 64) // q for x in w.ravel()], np.uint64).reshape(w.shape)


@dataclass
class FourStepTables:
    """Per-modulus precomputed tables, all u32 lo/hi pairs (host numpy)."""

    n: int
    n1: int
    n2: int
    q: int
    # elementwise tables, shape (n1, n2): value and shoup, each (lo, hi)
    twist: tuple          # ψ^{j1·n2+j2}
    itwist: tuple         # ψ^{-j} · N^{-1}
    twiddle: tuple        # T[r][j2] = ω^{rev(r)·j2}
    itwiddle: tuple       # ω^{-rev(r)·j2}
    # stage tables for the size-n1 / n2 column transforms, in EXPANDED
    # row-per-stage layout (S, m/2): row s (s=0 ↔ t=m/2, …, s=S-1 ↔ t=1)
    # holds w_t[j] = root^{j·m/(2t)} tiled g=m/(2t) times — so a kernel
    # stage reads one full static row and reshapes (g, t, 1), with no
    # sub-lane slicing (TPU tile constraints).
    gs1: tuple
    gs2: tuple
    ct1: tuple
    ct2: tuple
    q_pair: tuple         # scalars (qlo, qhi) as () arrays
    # u64 twins (value, shoup) of every table, for the XLA/shard_map path
    u64: dict = None

    @staticmethod
    def build(n: int, q: int, psi: int) -> "FourStepTables":
        n1 = 1 << ((n.bit_length() - 1) // 2)
        n2 = n // n1
        omega = pow(psi, 2, q)

        u64_tabs = {}

        def pairs(vals64: np.ndarray, name: str = None):
            sh = _shoup_np(vals64, q)
            if name:
                u64_tabs[name] = (vals64.astype(np.uint64), sh)
            vlo, vhi = _split_np(vals64.astype(np.uint64))
            slo, shi = _split_np(sh)
            return (vlo, vhi, slo, shi)

        j = np.arange(n, dtype=object)
        psi_pows = np.zeros(n, np.uint64)
        acc = 1
        for i in range(n):
            psi_pows[i] = acc
            acc = acc * psi % q
        twist = pairs(psi_pows.reshape(n1, n2), "twist")
        ipsi = primes.mod_inverse(psi, q)
        ninv = primes.mod_inverse(n, q)
        ipows = np.zeros(n, np.uint64)
        acc = ninv
        for i in range(n):
            ipows[i] = acc
            acc = acc * ipsi % q
        itwist = pairs(ipows.reshape(n1, n2), "itwist")

        rev1 = bit_reverse_indices(n1)
        tw = np.zeros((n1, n2), np.uint64)
        itw = np.zeros((n1, n2), np.uint64)
        iomega = primes.mod_inverse(omega, q)
        for r in range(n1):
            e = int(rev1[r])
            base = pow(omega, e, q)
            ibase = pow(iomega, e, q)
            acc, iacc = 1, 1
            for j2 in range(n2):
                tw[r, j2] = acc
                itw[r, j2] = iacc
                acc = acc * base % q
                iacc = iacc * ibase % q
        twiddle = pairs(tw, "twiddle")
        itwiddle = pairs(itw, "itwiddle")

        def stage_tables(m: int, root: int):
            """Expanded (S, m/2): row per stage t = m/2, …, 1; each row is
            w_t (t entries, w_t[j] = root^{j·m/(2t)}) tiled m/(2t) times."""
            S = m.bit_length() - 1
            out = np.zeros((S, m // 2), np.uint64)
            t = m // 2
            srow = 0
            while t >= 1:
                stride = m // (2 * t)
                base = pow(root, stride, q)
                wt = np.zeros(t, np.uint64)
                acc = 1
                for jj in range(t):
                    wt[jj] = acc
                    acc = acc * base % q
                out[srow] = np.tile(wt, m // (2 * t))
                t //= 2
                srow += 1
            return out

        om1 = pow(omega, n2, q)   # primitive n1-th root
        om2 = pow(omega, n1, q)   # primitive n2-th root
        gs1 = pairs(stage_tables(n1, om1), "gs1")
        gs2 = pairs(stage_tables(n2, om2), "gs2")
        ct1 = pairs(stage_tables(n1, primes.mod_inverse(om1, q)), "ct1")
        ct2 = pairs(stage_tables(n2, primes.mod_inverse(om2, q)), "ct2")
        qlo, qhi = np.uint32(q & 0xFFFFFFFF), np.uint32(q >> 32)
        return FourStepTables(
            n=n, n1=n1, n2=n2, q=q, twist=twist, itwist=itwist,
            twiddle=twiddle, itwiddle=itwiddle, gs1=gs1, gs2=gs2,
            ct1=ct1, ct2=ct2, q_pair=(qlo, qhi), u64=u64_tabs,
        )


def kernel_to_std(n: int) -> np.ndarray:
    """perm with std_eval[b] = kernel_eval[perm[b]] (both bit-reversed
    conventions; see module docstring)."""
    n1 = 1 << ((n.bit_length() - 1) // 2)
    n2 = n // n1
    rev1 = bit_reverse_indices(n1)
    rev2 = bit_reverse_indices(n2)
    rev_n = bit_reverse_indices(n)
    perm = np.zeros(n, np.int64)
    for r2 in range(n2):
        for r1 in range(n1):
            u = r2 * n1 + r1
            k = int(rev2[r2]) * n1 + int(rev1[r1])
            b = int(rev_n[k])
            perm[b] = u
    return perm


# ---------------------------------------------------------------------------
# Pure-jnp transform bodies on u32 pairs (shared by Pallas kernel & fallback)
# ---------------------------------------------------------------------------

def _emul(xlo, xhi, tab, qlo, qhi):
    """Elementwise Shoup multiply by a (value,shoup) table tuple."""
    wlo, whi, wslo, wshi = tab
    return up.shoup_mul64(xlo, xhi, wlo, whi, wslo, wshi, qlo, qhi)


def _col_gs(xlo, xhi, stage_tab, qlo, qhi, m: int):
    """GS (DIF) cyclic NTT over the leading axis of an (m, lanes) pair.
    Natural input → bit-reversed output rows. stage_tab: (S, m/2) expanded."""
    import jax.numpy as jnp

    lanes = xlo.shape[-1]
    tlo, thi, tslo, tshi = stage_tab
    srow = 0
    t = m // 2
    while t >= 1:
        g = m // (2 * t)
        a_lo = xlo.reshape(g, 2, t, lanes)
        a_hi = xhi.reshape(g, 2, t, lanes)
        ulo, uhi = a_lo[:, 0], a_hi[:, 0]
        vlo, vhi = a_lo[:, 1], a_hi[:, 1]
        slo, shi = up.modadd64(ulo, uhi, vlo, vhi, qlo, qhi)
        dlo, dhi = up.modsub64(ulo, uhi, vlo, vhi, qlo, qhi)
        w = (tlo[srow].reshape(g, t, 1), thi[srow].reshape(g, t, 1),
             tslo[srow].reshape(g, t, 1), tshi[srow].reshape(g, t, 1))
        dlo, dhi = _emul(dlo, dhi, w, qlo, qhi)
        xlo = jnp.stack([slo, dlo], axis=1).reshape(m, lanes)
        xhi = jnp.stack([shi, dhi], axis=1).reshape(m, lanes)
        srow += 1
        t //= 2
    return xlo, xhi


def _col_ct(xlo, xhi, stage_tab, qlo, qhi, m: int):
    """CT (DIT) inverse cyclic NTT over the leading axis: bit-reversed input
    rows → natural output. Stage tables are the ω^{-1} tables consumed in
    REVERSE order (t = 1, 2, …, m/2 uses the tail-to-head segments)."""
    import jax.numpy as jnp

    lanes = xlo.shape[-1]
    tlo, thi, tslo, tshi = stage_tab
    S = m.bit_length() - 1
    t = 1
    while t < m:
        g = m // (2 * t)
        srow = S - 1 - (t.bit_length() - 1)   # row s ↔ t = m/2^{s+1}
        a_lo = xlo.reshape(g, 2, t, lanes)
        a_hi = xhi.reshape(g, 2, t, lanes)
        ulo, uhi = a_lo[:, 0], a_hi[:, 0]
        vlo, vhi = a_lo[:, 1], a_hi[:, 1]
        w = (tlo[srow].reshape(g, t, 1), thi[srow].reshape(g, t, 1),
             tslo[srow].reshape(g, t, 1), tshi[srow].reshape(g, t, 1))
        vlo, vhi = _emul(vlo, vhi, w, qlo, qhi)
        slo, shi = up.modadd64(ulo, uhi, vlo, vhi, qlo, qhi)
        dlo, dhi = up.modsub64(ulo, uhi, vlo, vhi, qlo, qhi)
        xlo = jnp.stack([slo, dlo], axis=1).reshape(m, lanes)
        xhi = jnp.stack([shi, dhi], axis=1).reshape(m, lanes)
        t *= 2
    return xlo, xhi


def ntt_body(xlo, xhi, tabs: FourStepTables):
    """Forward negacyclic NTT body. x: (n1, n2) u32 pair → kernel order."""
    qlo, qhi = tabs.q_pair
    xlo, xhi = _emul(xlo, xhi, tabs.twist, qlo, qhi)
    xlo, xhi = _col_gs(xlo, xhi, tabs.gs1, qlo, qhi, tabs.n1)
    xlo, xhi = _emul(xlo, xhi, tabs.twiddle, qlo, qhi)
    xlo, xhi = xlo.T, xhi.T
    xlo, xhi = _col_gs(xlo, xhi, tabs.gs2, qlo, qhi, tabs.n2)
    return xlo, xhi                       # (n2 rows = rev k2, n1 lanes = rev k1)


def intt_body(xlo, xhi, tabs: FourStepTables):
    """Inverse: kernel-order (n2, n1) → natural-order coefficients (n1, n2)."""
    qlo, qhi = tabs.q_pair
    xlo, xhi = _col_ct(xlo, xhi, tabs.ct2, qlo, qhi, tabs.n2)
    xlo, xhi = xlo.T, xhi.T
    xlo, xhi = _emul(xlo, xhi, tabs.itwiddle, qlo, qhi)
    xlo, xhi = _col_ct(xlo, xhi, tabs.ct1, qlo, qhi, tabs.n1)
    xlo, xhi = _emul(xlo, xhi, tabs.itwist, qlo, qhi)
    return xlo, xhi
