"""Fused Pallas kernel for the MXU digit-matmul NTT (ops/mxu_ntt.py).

The plain-XLA mxu path materializes the int32 digit planes to HBM between
the matmul and the recompose (~4.5× the payload, twice per transform) —
at N=2^14 that HBM traffic, not compute, is the bound. This kernel keeps
the whole pipeline in VMEM per (ciphertext, limb) grid cell:

    digitize → int8 MXU dot → REDC recompose → twiddle → transpose →
    digitize → int8 MXU dot → REDC recompose → strict csub

All tables are padded to a UNIFORM digit count nd_max across limbs (a
40-bit limb's digits 6..8 of any value < 4q are structurally zero, and its
padded matrix digit-slices are zero, so the padded planes contribute
nothing) — one kernel shape serves the whole chain, grid=(B, L).

Matrices live in VMEM as (nd·m, nd·m) int8 — 1.3 MB per stage at N=2^14 —
so this kernel targets N ≤ 2^15; at N=2^16 the tables alone exceed VMEM
and the plain-XLA mxu path (already MXU-bound there) stays the right tool.

The arithmetic bodies are the SAME jnp-on-u32-pair helpers as the XLA path
(mxu_ntt._digitize/_recompose etc. operate on refs' loaded values
unchanged), so outputs are bit-exact across implementations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import mxu_ntt as M
from . import u32pair as up


def _vma(*xs):
    """Union of the inputs' varying-manual-axes — pallas_call out_shapes
    inside a shard_map must declare how outputs vary over mesh axes
    (check_vma); outside shard_map this is frozenset() and harmless."""
    import jax as _jax

    out = frozenset()
    for x in xs:
        out = out | getattr(_jax.typeof(x), "vma", frozenset())
    return out


def _align_vma(xs):
    """pvary every input up to the union of varying manual axes — a
    pallas_call's operands must agree on vma inside a shard_map (constant
    tables are unvarying until explicitly pvaried)."""
    import jax as _jax

    union = frozenset()
    for x in xs:
        union = union | getattr(_jax.typeof(x), "vma", frozenset())
    if not union:
        return list(xs)
    out = []
    for x in xs:
        need = union - getattr(_jax.typeof(x), "vma", frozenset())
        out.append(_jax.lax.pvary(x, tuple(need)) if need else x)
    return out


def _pad_tables(tabs: "M.MxuNttTables", nd_max: int):
    """Pad a limb's int8 matrices to the uniform nd_max layout:
    (nd·m, nd·m) with plane-major rows and digit-major contraction."""

    def pad(a, m_out, m_in):
        # a: (nd, m_out, nd·m_in) → (nd_max·m_out, nd_max·m_in)
        nd = a.shape[0]
        out = np.zeros((nd_max * m_out, nd_max * m_in), np.int8)
        for e in range(nd):
            out[e * m_out : (e + 1) * m_out, : nd * m_in] = a[e]
        return out

    n1, n2 = tabs.n1, tabs.n2
    return {
        "a1": pad(tabs.a1, n1, n1), "a2": pad(tabs.a2, n2, n2),
        "a2i": pad(tabs.a2i, n2, n2), "a1i": pad(tabs.a1i, n1, n1),
    }


def _kernel_digitize(lo, hi, nd: int):
    """u32 pair (m, c) → int8 (nd·m, c), digit-major rows."""
    digs = []
    for d in range(nd):
        s = M.DIGIT_BITS * d
        if s + M.DIGIT_BITS <= 32:
            v = (lo >> s) & M.DIGIT_MASK
        elif s >= 32:
            v = (hi >> (s - 32)) & M.DIGIT_MASK
        else:
            v = ((lo >> s) | (hi << (32 - s))) & M.DIGIT_MASK
        digs.append(v.astype(jnp.int8))
    return jnp.concatenate(digs, axis=0)


def _kernel_recompose(planes_i32, m: int, nd: int, split: int,
                      qinv_r, qlo, qhi):
    """(nd·m, c) i32 planes → u32 pair (m, c) < 4q (uniform REDC plan:
    split=4, matrices carry 2^{28} mod q)."""
    rs = M.DIGIT_BITS * split
    mask = np.uint32((1 << rs) - 1)
    p = planes_i32.astype(jnp.uint32)

    def plane(e):
        return p[e * m : (e + 1) * m, :]

    def shl(x, s):
        if s == 0:
            return x, jnp.zeros_like(x)
        if s >= 32:
            return jnp.zeros_like(x), x << (s - 32)
        return x << s, x >> (32 - s)

    slo, shi = shl(plane(0), 0)
    for e in range(1, split):
        tlo, thi = shl(plane(e), M.DIGIT_BITS * e)
        slo, shi = up.add64(slo, shi, tlo, thi)
    m_ = (slo & mask) * qinv_r & mask
    h1, l1 = up.mul32_wide(m_, qlo)
    h2, l2 = up.mul32_wide(m_, qhi)
    w0 = slo + l1
    c0 = (w0 < slo).astype(jnp.uint32)
    t = shi + h1
    c1 = (t < shi).astype(jnp.uint32)
    t2 = t + l2
    c1 = c1 + (t2 < t).astype(jnp.uint32)
    w1 = t2 + c0
    c1 = c1 + (w1 < t2).astype(jnp.uint32)
    w2 = h2 + c1
    ulo = (w0 >> rs) | (w1 << (32 - rs))
    uhi = (w1 >> rs) | (w2 << (32 - rs))
    if split >= nd:          # high plane group empty (nd <= 4 limbs)
        return ulo, uhi
    glo, ghi = shl(plane(split), 0)
    for e in range(split + 1, nd):
        tlo, thi = shl(plane(e), M.DIGIT_BITS * (e - split))
        glo, ghi = up.add64(glo, ghi, tlo, thi)
    return up.add64(ulo, uhi, glo, ghi)


class PallasMxuNtt:
    """Fused-kernel runner over a modulus chain (uniform padded layout).

    Per-digit-count groups route INDEPENDENTLY (r5, VERDICT r4 #2): a
    group whose stage matrices + tables fit the scoped-VMEM budget runs
    the fully-fused single kernel; an over-budget group (the nd=9 60-bit
    limb at N >= 2^15: ~17 MB scoped vs the 16 MB default) streams
    through the two-kernel PallasMxuNttBig pair instead. One runner
    serves every ring size — the N <= 2^14 behavior is unchanged (all
    groups fit) and larger rings get fused kernels for every limb that
    fits. Budget override: PPQSFLHE_FUSED_VMEM_KIB (pair it with XLA's
    --xla_tpu_scoped_vmem_limit_kib to actually raise the hardware-side
    scope)."""

    def __init__(self, n: int, moduli, psis):
        import os

        self.n = n
        # default budget: the 16 MB hardware scope over the measured ~1.24×
        # est→true factor (≈12.9 MB). Every Shoup-quad group this accepts
        # was already accepted at the old conservative 11 MiB; the only
        # config it newly admits is the 2-table mont-twiddle nd=6 group at
        # N=2^16 (est 12.59 MB → true ~15.6 MB, verified compiling on-chip
        # at the default scope — docs/PERF.md).
        self._vmem_budget = 1024 * int(
            os.environ.get("PPQSFLHE_FUSED_VMEM_KIB", "12896"))
        self._big = None                    # lazy streamed-pair delegate
        self._moduli = [int(q) for q in moduli]
        self._psis = [int(p) for p in psis]
        self.tabs = [M.MxuNttTables.build(n, int(q), int(p))
                     for q, p in zip(moduli, psis)]
        self.n1, self.n2 = self.tabs[0].n1, self.tabs[0].n2
        # per-limb digit counts: limbs are grouped by nd and each group
        # runs a kernel at its TRUE digit count — the round-3 uniform pad
        # to nd_max=9 made every 40-bit limb pay (9/6)² of the MXU work
        # and 9/6 of the digitize/recompose glue (VERDICT r4 re-measure)
        self._nd_of = [t.nd for t in self.tabs]
        for t in self.tabs:
            if t.plan.mode != "redc" or t.plan.split != 4:
                raise ValueError("uniform kernel needs the redc/4 plan")
        self.split = 4
        padded = [_pad_tables(t, t.nd) for t in self.tabs]
        self._mats = {
            k: [p[k] for p in padded] for k in ("a1", "a2", "a2i", "a1i")
        }
        self._mat_cache = {}
        quad = lambda name: tuple(
            np.stack([np.asarray(getattr(t, name)[i]) for t in self.tabs])
            for i in range(4))
        self._t1 = quad("t1")           # each (L, n1, n2) u32
        self._t1i = quad("t1i")         # each (L, n2, n1)
        self._q = (np.stack([np.array([[t.q_pair[0]]], np.uint32) for t in self.tabs]),
                   np.stack([np.array([[t.q_pair[1]]], np.uint32) for t in self.tabs]))
        self._q2 = (np.stack([np.array([[t.q2_pair[0]]], np.uint32) for t in self.tabs]),
                    np.stack([np.array([[t.q2_pair[1]]], np.uint32) for t in self.tabs]))
        self._qinv = np.stack([
            np.array([[np.uint32(t.plan.qinv_r & 0xFFFFFFFF)]], np.uint32)
            if t.plan.mode == "redc" else np.array([[0]], np.uint32)
            for t in self.tabs])
        # full 64-bit -q^{-1} mod 2^64 (Montgomery constant for the 2-table
        # mont-twiddle kernel variant); scalar (1,1) pairs like _q
        qinv64 = [(-pow(q, -1, 1 << 64)) % (1 << 64) for q in self._moduli]
        self._qinv64 = (
            np.stack([np.array([[v & 0xFFFFFFFF]], np.uint32) for v in qinv64]),
            np.stack([np.array([[v >> 32]], np.uint32) for v in qinv64]))
        self._tmont_cache = {}

    def _mont_twiddle(self, idxs, forward):
        """(lo, hi) u32 tables of w·2^64 mod q for the group's limbs —
        mont_mul64_lazy(a, w·2^64 mod q) == a·w mod q (lazy), so the fused
        kernel needs HALF the twiddle bytes of the Shoup quad. Cached as
        numpy per (limbs, direction)."""
        key = (tuple(idxs), forward)
        m = self._tmont_cache.get(key)
        if m is None:
            quad = self._t1 if forward else self._t1i
            los, his = [], []
            for i in idxs:
                w = quad[0][i].astype(object) | (
                    quad[1][i].astype(object) << 32)
                q = self._moduli[i]
                wm = (w << 64) % q           # elementwise python-int mod
                los.append((wm & 0xFFFFFFFF).astype(np.uint32))
                his.append((wm >> 32).astype(np.uint32))
            m = self._tmont_cache[key] = (np.stack(los), np.stack(his))
        return m

    def _group_mats(self, name, idxs):
        """Stacked group matrices, cached as NUMPY (device constants created
        inside a trace would leak tracers across jit calls)."""
        key = (name, tuple(idxs))
        m = self._mat_cache.get(key)
        if m is None:
            m = self._mat_cache[key] = np.stack(
                [self._mats[name][i] for i in idxs])
        return jnp.asarray(m)

    def _run(self, x64, forward: bool, idx=None, interpret: bool = False):
        L = x64.shape[-2]
        lead = x64.shape[:-2]
        x = x64.reshape((-1, L, self.n))
        B = x.shape[0]
        sel = list(range(len(self.tabs))) if idx is None else list(idx)
        assert len(sel) == L
        n1, n2 = self.n1, self.n2

        shape_in = (n1, n2) if forward else (n2, n1)
        shape_out = (n2, n1) if forward else (n1, n2)
        xlo = (x & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32).reshape(B, L, *shape_in)
        xhi = (x >> jnp.uint64(32)).astype(jnp.uint32).reshape(B, L, *shape_in)

        groups: dict = {}
        for k, i in enumerate(sel):
            groups.setdefault(self._nd_of[i], []).append(k)
        parts = []
        order = []
        for nd, ks in sorted(groups.items()):
            idxs = [sel[k] for k in ks]
            order.extend(ks)
            ksel = np.asarray(ks, np.int32)
            fits_shoup = self._group_fits(nd, 4)
            # 2-table mont-twiddle variant: ~n·8 B/limb less VMEM — fits
            # groups the 4-table Shoup quad pushes over budget (the nd=6
            # group at N=2^16) at ~3 extra u32 mults per coefficient
            fits_mont = fits_shoup or self._group_fits(nd, 2)
            if not fits_mont:
                # over-budget group streams through the two-kernel pair
                if self._big is None:
                    self._big = PallasMxuNttBig(self.n, self._moduli,
                                                self._psis)
                x_g = jnp.take(x, ksel, axis=1)
                parts.append(self._big._run(x_g, forward, idx=idxs,
                                            interpret=interpret)
                             .reshape(B, len(ks), *shape_out))
                continue
            parts.append(self._run_group(
                jnp.take(xlo, ksel, axis=1), jnp.take(xhi, ksel, axis=1),
                idxs, nd, forward, shape_in, shape_out, interpret,
                mont=not fits_shoup))
        out = jnp.concatenate(parts, axis=1)
        inv = np.argsort(np.asarray(order))
        out = jnp.take(out, jnp.asarray(inv, jnp.int32), axis=1)
        return out.reshape(lead + (L, self.n))

    def _group_fits(self, nd: int, twiddle_planes: int = 4) -> bool:
        """Scoped-VMEM estimate for one fused grid cell: both padded stage
        matrices + the twiddle tables + in/out u32 pairs, ×2 for Mosaic's
        pipeline double-buffering. The estimate undercounts Mosaic's true
        scoped allocation by ~1.24× (measured: nd=6 at N=2^16 estimates
        13.63 MB, Mosaic reports 16.88 MB), so the default budget is
        11 MiB against the hardware's 16 MB scope. Anchors: N=2^14 nd=9
        ≈ 6.3 MB est (fits, runs); N=2^15 nd=9 ≈ 15.4 MB est / 17.06 MB
        true (rejected). ``twiddle_planes``: 4 for the Shoup-lazy quad,
        2 for the Montgomery-form tables. Raise PPQSFLHE_FUSED_VMEM_KIB
        together with XLA's --xla_tpu_scoped_vmem_limit_kib to fuse
        bigger groups."""
        mats = (nd * self.n1) ** 2 + (nd * self.n2) ** 2
        tables = twiddle_planes * self.n * 4          # twiddle tables, u32
        xbuf = 4 * self.n * 4                         # lo/hi in + out
        return 2 * (mats + tables + xbuf) <= self._vmem_budget

    def _run_group(self, xlo, xhi, idxs, nd, forward, shape_in, shape_out,
                   interpret, mont: bool = False):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        B, L = xlo.shape[0], xlo.shape[1]
        split = self.split
        iarr = np.asarray(idxs)
        m_a = ("a1", "a2") if forward else ("a2i", "a1i")
        mats = [self._group_mats(k, idxs) for k in m_a]
        if mont:
            tw = [jnp.asarray(a) for a in self._mont_twiddle(idxs, forward)]
        else:
            tw = [jnp.asarray(a[iarr])
                  for a in (self._t1 if forward else self._t1i)]
        qlo_a, qhi_a = (jnp.asarray(a[iarr]) for a in self._q)
        q2lo_a, q2hi_a = (jnp.asarray(a[iarr]) for a in self._q2)
        qinv_a = jnp.asarray(self._qinv[iarr])
        i64lo_a, i64hi_a = (jnp.asarray(a[iarr]) for a in self._qinv64)

        Z = np.int32(0)
        m1_dim = shape_in[0]            # first-stage transform size
        m2_dim = shape_out[0]           # second-stage transform size

        def kernel(xlo_ref, xhi_ref, a_first_ref, a_second_ref,
                   *rest):
            tw_refs = rest[: len(tw)]
            (qlo_ref, qhi_ref, q2lo_ref, q2hi_ref, qinv_ref,
             i64lo_ref, i64hi_ref, olo_ref, ohi_ref) = rest[len(tw):]
            qlo = qlo_ref[0, 0, 0]
            qhi = qhi_ref[0, 0, 0]
            q2lo = q2lo_ref[0, 0, 0]
            q2hi = q2hi_ref[0, 0, 0]
            qinv = qinv_ref[0, 0, 0]
            lo = xlo_ref[0, 0]
            hi = xhi_ref[0, 0]
            # stage 1
            d1 = _kernel_digitize(lo, hi, nd)                 # (nd·m1, c)
            p1 = jnp.dot(a_first_ref[0], d1,
                         preferred_element_type=jnp.int32)     # (nd·m1, c)
            lo, hi = _kernel_recompose(p1, m1_dim, nd, split, qinv, qlo, qhi)
            # twiddle: inputs < 4q, output < 2q either way
            if mont:
                lo, hi = up.mont_mul64_lazy(
                    lo, hi, tw_refs[0][0], tw_refs[1][0], qlo, qhi,
                    i64lo_ref[0, 0, 0], i64hi_ref[0, 0, 0])
            else:
                lo, hi = up.shoup_mul64_lazy(
                    lo, hi, tw_refs[0][0], tw_refs[1][0], tw_refs[2][0],
                    tw_refs[3][0], qlo, qhi)
            # transpose to stage-2 layout
            lo = lo.T
            hi = hi.T
            # stage 2
            d2 = _kernel_digitize(lo, hi, nd)                 # (nd·m2, c)
            p2 = jnp.dot(a_second_ref[0], d2,
                         preferred_element_type=jnp.int32)
            lo, hi = _kernel_recompose(p2, m2_dim, nd, split, qinv, qlo, qhi)
            lo, hi = up.csub64(lo, hi, q2lo, q2hi)
            lo, hi = up.csub64(lo, hi, qlo, qhi)
            olo_ref[0, 0] = lo
            ohi_ref[0, 0] = hi

        def bspec(shape, has_batch):
            # grid is (L, B) with the CT axis fastest: the matrix/table
            # block index (l,) is then invariant across B consecutive
            # steps, so Mosaic fetches each stage matrix once per LIMB
            # instead of once per (ct, limb) cell. Cuts the kernel's HBM
            # read traffic ~B× (the ~1.2-2.7 MB matrix pair dominated it);
            # isolated marginal 3.10 -> 3.00 us/limb at N=2^14 (the DMA
            # was mostly overlapped), but the freed bandwidth also stops
            # the kernel starving neighbours in composed graphs.
            if has_batch:
                return pl.BlockSpec((1, 1) + shape, lambda l, b: (b, l, Z, Z),
                                    memory_space=pltpu.VMEM)
            return pl.BlockSpec((1,) + shape, lambda l, b: (l, Z, Z),
                                memory_space=pltpu.VMEM)

        in_specs = [
            bspec(shape_in, True), bspec(shape_in, True),
            bspec(mats[0].shape[1:], False), bspec(mats[1].shape[1:], False),
        ] + [bspec(tw[0].shape[1:], False)] * len(tw) + [
            bspec((1, 1), False)] * 7
        out_specs = (bspec(shape_out, True), bspec(shape_out, True))

        olo, ohi = pl.pallas_call(
            kernel,
            grid=(L, B),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=(
                jax.ShapeDtypeStruct((B, L, *shape_out), jnp.uint32,
                                     vma=_vma(xlo, xhi)),
                jax.ShapeDtypeStruct((B, L, *shape_out), jnp.uint32,
                                     vma=_vma(xlo, xhi)),
            ),
            interpret=interpret,
        )(*_align_vma([xlo, xhi, *mats, *tw, qlo_a, qhi_a, q2lo_a,
                       q2hi_a, qinv_a, i64lo_a, i64hi_a]))
        return olo.astype(jnp.uint64) | (ohi.astype(jnp.uint64) << jnp.uint64(32))

    def ntt(self, x64, idx=None, interpret: bool = False):
        return self._run(x64, True, idx, interpret)

    def intt(self, x64, idx=None, interpret: bool = False):
        return self._run(x64, False, idx, interpret)


class PallasMxuNttBig:
    """Streamed two-kernel variant for rings where BOTH padded stage
    matrices cannot co-reside in VMEM (N = 2^16: 2 × 5.3 MB int8 at
    nd=9, m=256 — VERDICT r3 #1).

    Split the fused kernel at the inter-stage transpose:

      kernel A: digitize → int8 MXU dot (stage 1) → REDC → lazy twiddle
      kernel B: transpose block → digitize → dot (stage 2) → REDC → csub

    Each kernel holds ONE full stage matrix in VMEM; its BlockSpec index
    depends only on the limb, so Mosaic's pipeline fetches it once per limb
    and revisits it across all (ct, column-block) grid steps. Only the
    recomposed u32 pairs (8 B/coeff) round-trip HBM between the kernels —
    ~1 MB/limb vs the plain-XLA mxu path's ~9 MB of int32 digit planes,
    which is exactly what bounds that path at this size (docs/PERF.md).

    The arithmetic bodies are shared with :class:`PallasMxuNtt`, so outputs
    stay bit-exact across every backend.
    """

    def __init__(self, n: int, moduli, psis, blk: int | None = None):
        import os

        if blk is None:
            blk = int(os.environ.get("PPQSFLHE_BIG_BLK", "128"))
        self.n = n
        self.tabs = [M.MxuNttTables.build(n, int(q), int(p))
                     for q, p in zip(moduli, psis)]
        self.n1, self.n2 = self.tabs[0].n1, self.tabs[0].n2
        if self.n1 % blk and blk % self.n1:
            raise ValueError(f"blk {blk} incompatible with n1={self.n1}")
        self.blk = blk
        # Limbs run at their OWN digit count (grouped per nd below) — a
        # uniform pad to nd_max=9 would waste (9/6)^2 of the MXU work on
        # every 40-bit limb (measured 22 µs/limb padded vs the per-nd
        # accounting ~15 µs at N=2^16).
        self._nd_of = [t.nd for t in self.tabs]
        for t in self.tabs:
            if t.plan.mode != "redc" or t.plan.split != 4:
                raise ValueError("uniform kernel needs the redc/4 plan")
        self.split = 4
        padded = [_pad_tables(t, t.nd) for t in self.tabs]
        self._mats = {
            k: [p[k] for p in padded] for k in ("a1", "a2", "a2i", "a1i")
        }
        self._mat_cache = {}    # (name, tuple(limb idxs)) -> stacked jnp
        quad = lambda name: tuple(
            np.stack([np.asarray(getattr(t, name)[i]) for t in self.tabs])
            for i in range(4))
        self._t1 = quad("t1")           # each (L, n1, n2) u32
        self._t1i = quad("t1i")         # each (L, n2, n1)
        self._q = (np.stack([np.array([[t.q_pair[0]]], np.uint32) for t in self.tabs]),
                   np.stack([np.array([[t.q_pair[1]]], np.uint32) for t in self.tabs]))
        self._q2 = (np.stack([np.array([[t.q2_pair[0]]], np.uint32) for t in self.tabs]),
                    np.stack([np.array([[t.q2_pair[1]]], np.uint32) for t in self.tabs]))
        self._qinv = np.stack([
            np.array([[np.uint32(t.plan.qinv_r & 0xFFFFFFFF)]], np.uint32)
            for t in self.tabs])

    def _stage_a(self, xlo, xhi, mats, tquad, consts, m_dim, nd, interpret):
        """grid (L, B, cols/blk): stage-1 dot + REDC + lazy twiddle.
        x: (B, L, m_dim, cols) u32 pairs → same-shape output, < 2q.
        Also the per-shard first half of the SHARDED fused transform
        (parallel/sharded_scheme._ntt_pallas): cols is then the shard's
        local column count and the caller passes shard-sliced twiddles."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        B, L = xlo.shape[0], xlo.shape[1]
        cols = xlo.shape[3]
        blk, split = min(self.blk, cols), self.split
        Z = np.int32(0)

        def kernel(xlo_ref, xhi_ref, a_ref, tlo_ref, thi_ref, tslo_ref,
                   tshi_ref, qlo_ref, qhi_ref, qinv_ref, olo_ref, ohi_ref):
            qlo = qlo_ref[0, 0, 0]
            qhi = qhi_ref[0, 0, 0]
            qinv = qinv_ref[0, 0, 0]
            lo = xlo_ref[0, 0]
            hi = xhi_ref[0, 0]
            d = _kernel_digitize(lo, hi, nd)
            p = jnp.dot(a_ref[0], d, preferred_element_type=jnp.int32)
            lo, hi = _kernel_recompose(p, m_dim, nd, split, qinv, qlo, qhi)
            lo, hi = up.shoup_mul64_lazy(
                lo, hi, tlo_ref[0], thi_ref[0], tslo_ref[0], tshi_ref[0],
                qlo, qhi)
            olo_ref[0, 0] = lo
            ohi_ref[0, 0] = hi

        xspec = pl.BlockSpec((1, 1, m_dim, blk), lambda l, b, k: (b, l, Z, k),
                             memory_space=pltpu.VMEM)
        mspec = pl.BlockSpec((1,) + mats.shape[1:],
                             lambda l, b, k: (l, Z, Z),
                             memory_space=pltpu.VMEM)
        tspec = pl.BlockSpec((1, m_dim, blk), lambda l, b, k: (l, Z, k),
                             memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((1, 1, 1), lambda l, b, k: (l, Z, Z),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(L, B, cols // blk),
            in_specs=[xspec, xspec, mspec] + [tspec] * 4 + [cspec] * 3,
            out_specs=(xspec, xspec),
            out_shape=(
                jax.ShapeDtypeStruct(xlo.shape, jnp.uint32,
                                     vma=_vma(xlo, xhi, *tquad)),
                jax.ShapeDtypeStruct(xhi.shape, jnp.uint32,
                                     vma=_vma(xlo, xhi, *tquad)),
            ),
            interpret=interpret,
        )(*_align_vma([xlo, xhi, mats, *tquad, *consts]))

    def _stage_b(self, tlo, thi, mats, consts, m_out, nd, interpret):
        """grid (L, B, rows/blk): VMEM transpose + stage-2 dot + REDC +
        strict csub. t: (B, L, rows, m_out) pairs → (B, L, m_out, rows).
        Sharded use: after the all_to_all the local layout is exactly
        (rows = m_in/D, m_out) — the kernel's in-VMEM transpose replaces
        the XLA swapaxes, so this is also the per-shard second half."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        B, L = tlo.shape[0], tlo.shape[1]
        rows = tlo.shape[2]
        blk, split = min(self.blk, rows), self.split
        Z = np.int32(0)

        def kernel(tlo_ref, thi_ref, a_ref, qlo_ref, qhi_ref, q2lo_ref,
                   q2hi_ref, qinv_ref, olo_ref, ohi_ref):
            qlo = qlo_ref[0, 0, 0]
            qhi = qhi_ref[0, 0, 0]
            q2lo = q2lo_ref[0, 0, 0]
            q2hi = q2hi_ref[0, 0, 0]
            qinv = qinv_ref[0, 0, 0]
            lo = tlo_ref[0, 0].T             # (m_out, blk)
            hi = thi_ref[0, 0].T
            d = _kernel_digitize(lo, hi, nd)
            p = jnp.dot(a_ref[0], d, preferred_element_type=jnp.int32)
            lo, hi = _kernel_recompose(p, m_out, nd, split, qinv, qlo, qhi)
            lo, hi = up.csub64(lo, hi, q2lo, q2hi)
            lo, hi = up.csub64(lo, hi, qlo, qhi)
            olo_ref[0, 0] = lo
            ohi_ref[0, 0] = hi

        inspec = pl.BlockSpec((1, 1, blk, m_out), lambda l, b, k: (b, l, k, Z),
                              memory_space=pltpu.VMEM)
        outspec = pl.BlockSpec((1, 1, m_out, blk), lambda l, b, k: (b, l, Z, k),
                               memory_space=pltpu.VMEM)
        mspec = pl.BlockSpec((1,) + mats.shape[1:],
                             lambda l, b, k: (l, Z, Z),
                             memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((1, 1, 1), lambda l, b, k: (l, Z, Z),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(L, B, rows // blk),
            in_specs=[inspec, inspec, mspec] + [cspec] * 5,
            out_specs=(outspec, outspec),
            out_shape=(
                jax.ShapeDtypeStruct((B, L, m_out, rows), jnp.uint32,
                                     vma=_vma(tlo, thi)),
                jax.ShapeDtypeStruct((B, L, m_out, rows), jnp.uint32,
                                     vma=_vma(tlo, thi)),
            ),
            interpret=interpret,
        )(*_align_vma([tlo, thi, mats, *consts]))

    def _group_mats(self, name, idxs):
        """Stacked group matrices, cached as NUMPY (device constants created
        inside a trace would leak tracers across jit calls)."""
        key = (name, tuple(idxs))
        m = self._mat_cache.get(key)
        if m is None:
            m = self._mat_cache[key] = np.stack(
                [self._mats[name][i] for i in idxs])
        return jnp.asarray(m)

    def _run(self, x64, forward: bool, idx=None, interpret: bool = False):
        L = x64.shape[-2]
        lead = x64.shape[:-2]
        x = x64.reshape((-1, L, self.n))
        B = x.shape[0]
        sel = list(range(len(self.tabs))) if idx is None else list(idx)
        assert len(sel) == L
        n1, n2 = self.n1, self.n2

        shape_in = (n1, n2) if forward else (n2, n1)
        shape_out = (n2, n1) if forward else (n1, n2)
        xlo = (x & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32).reshape(B, L, *shape_in)
        xhi = (x >> jnp.uint64(32)).astype(jnp.uint32).reshape(B, L, *shape_in)

        # group the selected limbs by digit count; one two-kernel pass per
        # group at its true nd (see __init__ note)
        groups: dict = {}
        for k, i in enumerate(sel):
            groups.setdefault(self._nd_of[i], []).append(k)

        m_a = ("a1", "a2") if forward else ("a2i", "a1i")
        t_src = self._t1 if forward else self._t1i
        parts = []
        order = []
        for nd, ks in sorted(groups.items()):
            idxs = [sel[k] for k in ks]
            order.extend(ks)
            ksel = np.asarray(ks, np.int32)
            g_lo = jnp.take(xlo, ksel, axis=1)
            g_hi = jnp.take(xhi, ksel, axis=1)
            mats = [self._group_mats(nm, idxs) for nm in m_a]
            tquad = [jnp.asarray(a[np.asarray(idxs)]) for a in t_src]
            qlo_a, qhi_a = (jnp.asarray(a[np.asarray(idxs)]) for a in self._q)
            q2lo_a, q2hi_a = (jnp.asarray(a[np.asarray(idxs)]) for a in self._q2)
            qinv_a = jnp.asarray(self._qinv[np.asarray(idxs)])
            lo, hi = self._stage_a(g_lo, g_hi, mats[0], tquad,
                                   (qlo_a, qhi_a, qinv_a), shape_in[0], nd,
                                   interpret)
            olo, ohi = self._stage_b(lo, hi, mats[1],
                                     (qlo_a, qhi_a, q2lo_a, q2hi_a, qinv_a),
                                     shape_out[0], nd, interpret)
            parts.append(olo.astype(jnp.uint64)
                         | (ohi.astype(jnp.uint64) << jnp.uint64(32)))
        out = jnp.concatenate(parts, axis=1)
        inv = np.argsort(np.asarray(order))
        out = jnp.take(out, jnp.asarray(inv, jnp.int32), axis=1)
        return out.reshape(lead + (L, self.n))

    def ntt(self, x64, idx=None, interpret: bool = False):
        return self._run(x64, True, idx, interpret)

    def intt(self, x64, idx=None, interpret: bool = False):
        return self._run(x64, False, idx, interpret)
