"""Fused Pallas kernel for the HPS fast base extension (core/rns.py
BaseExtender.extend), optionally with the key-switch digit decomposition
folded in.

After the fused KSK inner product (ops/pallas_ks.py) the keyswitch's
remaining elementwise share is the base extension + ModDown correction
chain on XLA's u64 emulation (docs/PERF.md "Key-switch kernel"). This
kernel runs the whole per-coefficient chain on u32 pairs in one VMEM pass:

    y_i   = x_i · C_i mod d_i          (C_i = dhat_inv_i, or
                                        ghat_inv_i·dhat_inv_i mod d_i when
                                        the key-switch decompose is folded)
    alpha = carries + round-bit of Σ_i y_i · round(2^64/d_i)  (Q0.64)
    z_j   = Σ_i y_i·[D/d_i]_{p_j} − alpha·[D]_{p_j}   (mod p_j)

All constants are baked into the kernel as u32 scalars (they are static
per context), so the body is pure register arithmetic between one block
load and one store. Bit-exact vs BaseExtender.extend (same fixed-point
alpha rule); the fold of ghat_inv into C_i is exact (product of two
constants mod d_i).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import u32pair as up

_LANES = 128

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


def _pair(v: int):
    # NUMPY scalars: jnp constants captured by a pallas kernel closure are
    # rejected ("captures constants ... pass them as inputs"); np scalars
    # are literals the tracer folds in place.
    return (np.uint32(v & 0xFFFFFFFF), np.uint32((v >> 32) & 0xFFFFFFFF))


def _shoup(w: int, q: int):
    return (w << 64) // q


def _shoup_wide64(alo, ahi, wlo, whi, wslo, wshi, qlo, qhi):
    """a·w mod q for UNREDUCED a < 2^62 (core/modarith.shoup_mul_wide's
    bound): lazy Shoup + two conditional subtracts."""
    lo, hi = up.shoup_mul64_lazy(alo, ahi, wlo, whi, wslo, wshi, qlo, qhi)
    lo, hi = up.csub64(lo, hi, qlo, qhi)
    return up.csub64(lo, hi, qlo, qhi)


@functools.lru_cache(maxsize=64)
def _build(src: tuple, dst: tuple, pre: tuple | None, nr: int,
           interpret: bool, lanes: int = _LANES):
    """Kernel fn for a (src basis, dst basis, folded pre-constants) combo."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..core import primes

    ls, ld = len(src), len(dst)
    D = 1
    for q in src:
        D *= q
    # per-src constants
    y_c, y_sh, recip = [], [], []
    for i, q in enumerate(src):
        c = primes.mod_inverse((D // q) % q, q)
        if pre is not None:
            c = (c * pre[i]) % q
        y_c.append(_pair(c))
        y_sh.append(_pair(_shoup(c, q)))
        recip.append(_pair(((1 << 64) + q // 2) // q))
    src_q = [_pair(q) for q in src]
    # per-(dst, src) and per-dst constants
    dmat, dmat_sh = [], []
    dcor, dcor_sh = [], []
    dst_q = [_pair(p) for p in dst]
    for p in dst:
        row, row_sh = [], []
        for q in src:
            w = (D // q) % p
            row.append(_pair(w))
            row_sh.append(_pair(_shoup(w, p)))
        dmat.append(row)
        dmat_sh.append(row_sh)
        w = D % p
        dcor.append(_pair(w))
        dcor_sh.append(_pair(_shoup(w, p)))

    def kernel(xlo_ref, xhi_ref, olo_ref, ohi_ref):
        ys = []
        for i in range(ls):
            ql, qh = src_q[i]
            y = up.shoup_mul64(xlo_ref[0, i], xhi_ref[0, i],
                               *y_c[i], *y_sh[i], ql, qh)
            ys.append(y)
        # alpha = carries + round bit of the wrapping Q0.64 sum
        alo = ahi = None
        carry = None
        for i in range(ls):
            flo, fhi = up.mullo64(*ys[i], *recip[i])
            if alo is None:
                alo, ahi = flo, fhi
                carry = jnp.zeros_like(flo)
            else:
                nlo = alo + flo
                c0 = (nlo < alo).astype(jnp.uint32)
                nhi0 = ahi + fhi
                c1 = (nhi0 < ahi).astype(jnp.uint32)
                nhi = nhi0 + c0
                c1 = c1 + (nhi < nhi0).astype(jnp.uint32)
                alo, ahi = nlo, nhi
                carry = carry + c1
        alpha = carry + (ahi >> 31)            # + round(top bit)
        azero = jnp.zeros_like(alpha)
        for j in range(ld):
            ql, qh = dst_q[j]
            acc = None
            for i in range(ls):
                t = _shoup_wide64(*ys[i], *dmat[j][i], *dmat_sh[j][i], ql, qh)
                acc = t if acc is None else up.modadd64(*acc, *t, ql, qh)
            corr = up.shoup_mul64(alpha, azero, *dcor[j], *dcor_sh[j], ql, qh)
            olo_ref[0, j], ohi_ref[0, j] = up.modsub64(*acc, *corr, ql, qh)

    Z = np.int32(0)
    xspec = pl.BlockSpec((1, ls, nr, lanes), lambda b: (b, Z, Z, Z),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, ld, nr, lanes), lambda b: (b, Z, Z, Z),
                         memory_space=pltpu.VMEM)

    def run(xlo, xhi):
        Bf = xlo.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(Bf,),
            in_specs=[xspec, xspec],
            out_specs=(ospec, ospec),
            out_shape=(
                jax.ShapeDtypeStruct((Bf, ld, nr, lanes), jnp.uint32,
                                     vma=_vma(xlo, xhi)),
                jax.ShapeDtypeStruct((Bf, ld, nr, lanes), jnp.uint32,
                                     vma=_vma(xlo, xhi)),
            ),
            interpret=interpret,
        )(*_align_vma([xlo, xhi]))

    return run


def fused_extend(x64, extender, pre=None, interpret: bool = False):
    """Drop-in for ``extender.extend(x64)`` (coeff domain), optionally with
    per-src-limb constants ``pre`` (ints) folded into the y multiply —
    used to absorb the key-switch digit decomposition's [Q̂_j^{-1}]_{q_i}.
    x64: u64[..., ls, N] → u64[..., ld, N]."""
    lead = x64.shape[:-2]
    ls, N = x64.shape[-2:]
    assert ls == len(extender.src)
    # lane-width fallback for small per-shard polys (interpret-mode tests)
    lanes = _LANES
    while N % lanes:
        lanes //= 2
    nr = N // lanes
    Bf = int(np.prod(lead)) if lead else 1
    x = x64.reshape((Bf, ls, nr, lanes))
    xlo = (x & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    xhi = (x >> jnp.uint64(32)).astype(jnp.uint32)
    run = _build(tuple(extender.src), tuple(extender.dst),
                 tuple(int(v) for v in pre) if pre is not None else None,
                 nr, interpret, lanes)
    olo, ohi = run(xlo, xhi)
    out = olo.astype(jnp.uint64) | (ohi.astype(jnp.uint64) << jnp.uint64(32))
    return out.reshape(lead + (len(extender.dst), N))
