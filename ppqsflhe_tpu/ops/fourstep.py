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
    # constant-geometry (Pease) stage tables, shape (S, m/2, 1): row s holds
    # W_s[i] = root^{(i>>s)<<s} (forward) / its inverse-root twin (inverse).
    # Every Pease stage has IDENTICAL dataflow (split halves → butterfly →
    # interleave), so a kernel can fori_loop over stages with static shapes —
    # the fix for the Mosaic compile blow-up of the 14-stage unroll (the
    # Pease network provably produces the same output order as the in-place
    # GS-DIF network: butterfly path bits accumulate MSB-first in both).
    pgs1: tuple
    pgs2: tuple
    pct1: tuple
    pct2: tuple
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

        def pease_tables(m: int, root: int):
            """(S, m/2, 1): row s holds W_s[i] = root^{(i>>s)<<s}."""
            S = m.bit_length() - 1
            h = m // 2
            out = np.zeros((S, h, 1), np.uint64)
            i = np.arange(h)
            for s in range(S):
                exps = (i >> s) << s
                out[s, :, 0] = [pow(root, int(e), q) for e in exps]
            return out

        om1 = pow(omega, n2, q)   # primitive n1-th root
        om2 = pow(omega, n1, q)   # primitive n2-th root
        iom1 = primes.mod_inverse(om1, q)
        iom2 = primes.mod_inverse(om2, q)
        gs1 = pairs(stage_tables(n1, om1), "gs1")
        gs2 = pairs(stage_tables(n2, om2), "gs2")
        ct1 = pairs(stage_tables(n1, iom1), "ct1")
        ct2 = pairs(stage_tables(n2, iom2), "ct2")
        pgs1 = pairs(pease_tables(n1, om1), "pgs1")
        pgs2 = pairs(pease_tables(n2, om2), "pgs2")
        pct1 = pairs(pease_tables(n1, iom1), "pct1")
        pct2 = pairs(pease_tables(n2, iom2), "pct2")
        qlo, qhi = np.uint32(q & 0xFFFFFFFF), np.uint32(q >> 32)
        return FourStepTables(
            n=n, n1=n1, n2=n2, q=q, twist=twist, itwist=itwist,
            twiddle=twiddle, itwiddle=itwiddle, gs1=gs1, gs2=gs2,
            ct1=ct1, ct2=ct2, pgs1=pgs1, pgs2=pgs2, pct1=pct1, pct2=pct2,
            q_pair=(qlo, qhi), u64=u64_tabs,
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
    """Elementwise Shoup multiply by a (value,shoup) table tuple — strict
    (result < q; tolerates inputs < 4q since the single conditional
    subtract lands the lazy [0,2q) residue in [0,q))."""
    wlo, whi, wslo, wshi = tab
    return up.shoup_mul64(xlo, xhi, wlo, whi, wslo, wshi, qlo, qhi)


def _emul_lazy(xlo, xhi, tab, qlo, qhi):
    """Elementwise lazy Shoup multiply: inputs < 4q → outputs < 2q."""
    wlo, whi, wslo, wshi = tab
    return up.shoup_mul64_lazy(xlo, xhi, wlo, whi, wslo, wshi, qlo, qhi)


def _dbl(qlo, qhi):
    """2q as a u32 pair (q < 2^63). The low-word doubling intentionally
    wraps mod 2^32; for host numpy scalars compute in Python ints (numpy
    would emit an overflow RuntimeWarning), for traced values (inside the
    Pallas kernel) wrapping u32 arithmetic is exact and silent."""
    if isinstance(qlo, (int, np.integer)):
        q2 = ((int(qhi) << 32) | int(qlo)) * 2
        return np.uint32(q2 & 0xFFFFFFFF), np.uint32(q2 >> 32)
    return qlo + qlo, qhi + qhi + (qlo >> 31)


def _col_gs(xlo, xhi, stage_tab, qlo, qhi, m: int):
    """GS (DIF) cyclic NTT over the leading axis of an (m, lanes) pair.
    Natural input → bit-reversed output rows. stage_tab: (S, m/2) expanded.

    Harvey-lazy: the per-stage invariant is x < 2q (sums reduced mod 2q,
    differences computed as u−v+2q < 4q then lazily Shoup-multiplied back
    under 2q) — the compare/select corrections of modsub + shoup are
    skipped in every butterfly. OUTPUT IS IN [0, 2q); callers finish with
    one csub64 (ntt_body) or a strict _emul (intt_body)."""
    import jax.numpy as jnp

    lanes = xlo.shape[-1]
    tlo, thi, tslo, tshi = stage_tab
    q2lo, q2hi = _dbl(qlo, qhi)
    srow = 0
    t = m // 2
    while t >= 1:
        g = m // (2 * t)
        a_lo = xlo.reshape(g, 2, t, lanes)
        a_hi = xhi.reshape(g, 2, t, lanes)
        ulo, uhi = a_lo[:, 0], a_hi[:, 0]
        vlo, vhi = a_lo[:, 1], a_hi[:, 1]
        slo, shi = up.modadd64(ulo, uhi, vlo, vhi, q2lo, q2hi)
        dlo, dhi = up.lazy_diff64(ulo, uhi, vlo, vhi, q2lo, q2hi)
        w = (tlo[srow].reshape(g, t, 1), thi[srow].reshape(g, t, 1),
             tslo[srow].reshape(g, t, 1), tshi[srow].reshape(g, t, 1))
        dlo, dhi = _emul_lazy(dlo, dhi, w, qlo, qhi)
        xlo = jnp.stack([slo, dlo], axis=1).reshape(m, lanes)
        xhi = jnp.stack([shi, dhi], axis=1).reshape(m, lanes)
        srow += 1
        t //= 2
    return xlo, xhi


def _col_ct(xlo, xhi, stage_tab, qlo, qhi, m: int):
    """CT (DIT) inverse cyclic NTT over the leading axis: bit-reversed input
    rows → natural output. Stage tables are the ω^{-1} tables consumed in
    REVERSE order (t = 1, 2, …, m/2 uses the tail-to-head segments).

    Harvey-lazy with invariant x < 2q: v·w is a lazy Shoup product (< 2q),
    the sum reduces mod 2q, the difference u−vw+2q < 4q gets one csub64 to
    re-establish < 2q. OUTPUT IS IN [0, 2q); intt_body's final strict
    _emul (itwist) lands the result in [0, q)."""
    import jax.numpy as jnp

    lanes = xlo.shape[-1]
    tlo, thi, tslo, tshi = stage_tab
    q2lo, q2hi = _dbl(qlo, qhi)
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
        vlo, vhi = _emul_lazy(vlo, vhi, w, qlo, qhi)
        slo, shi = up.modadd64(ulo, uhi, vlo, vhi, q2lo, q2hi)
        dlo, dhi = up.lazy_diff64(ulo, uhi, vlo, vhi, q2lo, q2hi)
        dlo, dhi = up.csub64(dlo, dhi, q2lo, q2hi)
        xlo = jnp.stack([slo, dlo], axis=1).reshape(m, lanes)
        xhi = jnp.stack([shi, dhi], axis=1).reshape(m, lanes)
        t *= 2
    return xlo, xhi


def _row_select(tab4, s, S: int):
    """Select row ``s`` (traced scalar) of four (S, h, 1) tables via a chain
    of static-row selects — Mosaic lowers neither dynamic_slice nor unsigned
    reductions, but a scalar-predicated select of statically-indexed rows is
    plain VPU code (S−1 selects of an (h, 1) vector: negligible)."""
    import jax.numpy as jnp

    def pick(t):
        acc = t[0]
        for i in range(1, S):
            acc = jnp.where(s == i, t[i], acc)
        return acc

    return tuple(pick(t) for t in tab4)


def _col_gs_cg(xlo, xhi, tab, qlo, qhi, m: int):
    """Constant-geometry (Pease) GS-DIF cyclic NTT over axis -2 of a
    (..., m, lanes) u32 pair — natural input → bit-reversed output, identical
    to :func:`_col_gs` but with one static butterfly body looped over the
    log2(m) stages (Mosaic compiles the body ONCE). Stage s: split halves
    u = x[:m/2], v = x[m/2:]; sum → even rows, (u−v)·W_s → odd rows."""
    import jax
    import jax.numpy as jnp

    h = m // 2
    lead = xlo.shape[:-2]
    lanes = xlo.shape[-1]
    S = m.bit_length() - 1
    q2lo, q2hi = _dbl(qlo, qhi)

    # while_loop with the stage index in the CARRY: using the fori_loop
    # induction variable in kernel computation trips an infinite-recursion
    # bug in Pallas tracing (jax 0.8.x); a carried counter does not.
    # Harvey-lazy like _col_gs: invariant < 2q, output < 2q.
    def body(c):
        s, xlo, xhi = c
        ulo, uhi = xlo[..., :h, :], xhi[..., :h, :]
        vlo, vhi = xlo[..., h:, :], xhi[..., h:, :]
        slo, shi = up.modadd64(ulo, uhi, vlo, vhi, q2lo, q2hi)
        dlo, dhi = up.lazy_diff64(ulo, uhi, vlo, vhi, q2lo, q2hi)
        w = _row_select(tab, s, S)
        dlo, dhi = up.shoup_mul64_lazy(dlo, dhi, *w, qlo, qhi)
        return (s + jnp.int32(1),
                jnp.stack([slo, dlo], axis=-2).reshape(lead + (m, lanes)),
                jnp.stack([shi, dhi], axis=-2).reshape(lead + (m, lanes)))

    _, xlo, xhi = jax.lax.while_loop(
        lambda c: c[0] < jnp.int32(S), body, (jnp.int32(0), xlo, xhi))
    return xlo, xhi


def _col_ct_cg(xlo, xhi, tab, qlo, qhi, m: int):
    """Exact inverse of :func:`_col_gs_cg` run stage-by-stage in reverse,
    WITHOUT the per-stage 1/2 (accumulates a factor m, cancelled by the
    N^{-1} folded into itwist — same convention as :func:`_col_ct`).
    Stage s undo: a = x[0::2], b = x[1::2]·W_s^{-1}; a+b → x[:m/2],
    a−b → x[m/2:]. tab holds the inverse-root Pease tables (pct*)."""
    import jax
    import jax.numpy as jnp

    h = m // 2
    lead = xlo.shape[:-2]
    lanes = xlo.shape[-1]
    S = m.bit_length() - 1
    q2lo, q2hi = _dbl(qlo, qhi)

    # Harvey-lazy like _col_ct: invariant < 2q, output < 2q.
    def body(c):
        s, xlo, xhi = c            # s runs S-1 → 0 (undo stages in reverse)
        r_lo = xlo.reshape(lead + (h, 2, lanes))
        r_hi = xhi.reshape(lead + (h, 2, lanes))
        alo, blo = r_lo[..., 0, :], r_lo[..., 1, :]
        ahi, bhi = r_hi[..., 0, :], r_hi[..., 1, :]
        w = _row_select(tab, s, S)
        blo, bhi = up.shoup_mul64_lazy(blo, bhi, *w, qlo, qhi)
        ulo, uhi = up.modadd64(alo, ahi, blo, bhi, q2lo, q2hi)
        vlo, vhi = up.lazy_diff64(alo, ahi, blo, bhi, q2lo, q2hi)
        vlo, vhi = up.csub64(vlo, vhi, q2lo, q2hi)
        return (s - jnp.int32(1),
                jnp.concatenate([ulo, vlo], axis=-2),
                jnp.concatenate([uhi, vhi], axis=-2))

    _, xlo, xhi = jax.lax.while_loop(
        lambda c: c[0] >= jnp.int32(0), body, (jnp.int32(S - 1), xlo, xhi))
    return xlo, xhi


def ntt_body_cg(xlo, xhi, tabs):
    """Forward four-step body with constant-geometry column transforms.
    Bit-exact ≡ :func:`ntt_body` (Harvey-lazy inside, final csub64);
    Mosaic-compilable (rolled stage loops). Leading batch dims OK."""
    import jax.numpy as jnp

    qlo, qhi = tabs.q_pair
    xlo, xhi = _emul_lazy(xlo, xhi, tabs.twist, qlo, qhi)
    xlo, xhi = _col_gs_cg(xlo, xhi, tabs.pgs1, qlo, qhi, tabs.n1)
    xlo, xhi = _emul_lazy(xlo, xhi, tabs.twiddle, qlo, qhi)
    xlo, xhi = jnp.swapaxes(xlo, -1, -2), jnp.swapaxes(xhi, -1, -2)
    xlo, xhi = _col_gs_cg(xlo, xhi, tabs.pgs2, qlo, qhi, tabs.n2)
    return up.csub64(xlo, xhi, qlo, qhi)


def intt_body_cg(xlo, xhi, tabs):
    """Inverse four-step body, constant-geometry. Bit-exact ≡ intt_body.
    Accepts leading batch dims: x is (..., n2, n1)."""
    import jax.numpy as jnp

    qlo, qhi = tabs.q_pair
    xlo, xhi = _col_ct_cg(xlo, xhi, tabs.pct2, qlo, qhi, tabs.n2)
    xlo, xhi = jnp.swapaxes(xlo, -1, -2), jnp.swapaxes(xhi, -1, -2)
    xlo, xhi = _emul_lazy(xlo, xhi, tabs.itwiddle, qlo, qhi)
    xlo, xhi = _col_ct_cg(xlo, xhi, tabs.pct1, qlo, qhi, tabs.n1)
    xlo, xhi = _emul(xlo, xhi, tabs.itwist, qlo, qhi)
    return xlo, xhi


def ntt_body(xlo, xhi, tabs: FourStepTables):
    """Forward negacyclic NTT body. x: (n1, n2) u32 pair → kernel order.
    Internally Harvey-lazy (< 2q between stages); one final csub64 restores
    exact residues — outputs are bit-identical to the strict version."""
    qlo, qhi = tabs.q_pair
    xlo, xhi = _emul_lazy(xlo, xhi, tabs.twist, qlo, qhi)
    xlo, xhi = _col_gs(xlo, xhi, tabs.gs1, qlo, qhi, tabs.n1)
    xlo, xhi = _emul_lazy(xlo, xhi, tabs.twiddle, qlo, qhi)
    xlo, xhi = xlo.T, xhi.T
    xlo, xhi = _col_gs(xlo, xhi, tabs.gs2, qlo, qhi, tabs.n2)
    return up.csub64(xlo, xhi, qlo, qhi)  # (n2 rows = rev k2, n1 lanes = rev k1)


def intt_body(xlo, xhi, tabs: FourStepTables):
    """Inverse: kernel-order (n2, n1) → natural-order coefficients (n1, n2).
    Harvey-lazy internally; the final strict itwist multiply lands < q."""
    qlo, qhi = tabs.q_pair
    xlo, xhi = _col_ct(xlo, xhi, tabs.ct2, qlo, qhi, tabs.n2)
    xlo, xhi = xlo.T, xhi.T
    xlo, xhi = _emul_lazy(xlo, xhi, tabs.itwiddle, qlo, qhi)
    xlo, xhi = _col_ct(xlo, xhi, tabs.ct1, qlo, qhi, tabs.n1)
    xlo, xhi = _emul(xlo, xhi, tabs.itwist, qlo, qhi)
    return xlo, xhi
