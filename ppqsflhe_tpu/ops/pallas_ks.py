"""Fused Pallas kernel for the hybrid key-switch KSK inner product.

After the Montgomery-form key conversion (eval.ksk_to_mont), the keyswitch
bound is its ELEMENTWISE share, not the NTTs (docs/PERF.md "Key-switch
kernel"): the per-digit inner product Σ_j digit_j · ksk_j runs on XLA's
u64 emulation, which benches ~5× slower than explicit u32-pair arithmetic
in isolated chains (the pairs only pay off inside Pallas kernels — swapping
the XLA graph to pairs loses fusion, ADVICE r2/PERF r3). This kernel IS
that exception: one VMEM-resident pass computes, per limb tile,

    acc_c = Σ_j mont_mul(digit_j, ksk[j, c])   (c = 0, 1)

entirely on u32 pairs (ops/u32pair.py mont_mul64/modadd64), writing both
accumulated components — 4·nd mont_muls + 2·(nd−1) modadds per coefficient
with zero HBM round-trips in between, vs 2·nd separate XLA kernels.

Bit-exact vs the XLA path (same pair primitives); tests run interpret mode.
"""

from __future__ import annotations

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


def ks_inner_product(digits, ksk_mont, q_pairs, qinv_pairs,
                     interpret: bool = False):
    """digits: u64[..., nd, LK, N] (leading batch dims allowed — they fold
    into an outer grid axis); ksk_mont: u64[nd, 2, LK, N] (Montgomery
    form, shared across the batch); q_pairs/qinv_pairs: u32[LK, 2]
    (lo, hi) per limb. Returns u64[..., 2, LK, N] =
    (Σ_j d_j·k_j0, Σ_j d_j·k_j1) mod q per limb."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lead = digits.shape[:-3]
    nd, LK, N = digits.shape[-3:]
    # lane-width fallback for small local polys (coefficient-sharded tiny
    # test rings run this kernel per shard with N/D < 128 in interpret mode)
    lanes = _LANES
    while N % lanes:
        lanes //= 2
    nr = N // lanes
    Bf = int(np.prod(lead)) if lead else 1

    def pairs(x, shape):
        x = x.reshape(shape)
        return ((x & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
                (x >> jnp.uint64(32)).astype(jnp.uint32))

    dlo, dhi = pairs(digits, (Bf, nd, LK, nr, lanes))
    klo, khi = pairs(ksk_mont, (nd, 2, LK, nr, lanes))
    qlo = q_pairs[:, 0].reshape(LK, 1, 1)
    qhi = q_pairs[:, 1].reshape(LK, 1, 1)
    ilo = qinv_pairs[:, 0].reshape(LK, 1, 1)
    ihi = qinv_pairs[:, 1].reshape(LK, 1, 1)

    Z = np.int32(0)

    def kernel(dlo_ref, dhi_ref, klo_ref, khi_ref,
               qlo_ref, qhi_ref, ilo_ref, ihi_ref, olo_ref, ohi_ref):
        ql = qlo_ref[0, 0, 0]
        qh = qhi_ref[0, 0, 0]
        il = ilo_ref[0, 0, 0]
        ih = ihi_ref[0, 0, 0]
        for c in range(2):
            alo = ahi = None
            for j in range(nd):
                tlo, thi = up.mont_mul64(
                    dlo_ref[0, j, 0], dhi_ref[0, j, 0],
                    klo_ref[j, c, 0], khi_ref[j, c, 0], ql, qh, il, ih)
                if alo is None:
                    alo, ahi = tlo, thi
                else:
                    alo, ahi = up.modadd64(alo, ahi, tlo, thi, ql, qh)
            olo_ref[0, c, 0] = alo
            ohi_ref[0, c, 0] = ahi

    # grid is (LK, Bf) with the batch axis fastest: the KSK block's index
    # (l,) is then invariant across Bf consecutive steps, so Mosaic fetches
    # each limb's nd·2·N·8 B key slice once per LIMB instead of once per
    # (ct, limb) cell (same HBM-traffic argument as pallas_mxu_ntt's grid).
    dspec = pl.BlockSpec((1, nd, 1, nr, lanes), lambda l, b: (b, Z, l, Z, Z),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((nd, 2, 1, nr, lanes), lambda l, b: (Z, Z, l, Z, Z),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((1, 1, 1), lambda l, b: (l, Z, Z),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, 2, 1, nr, lanes), lambda l, b: (b, Z, l, Z, Z),
                         memory_space=pltpu.VMEM)

    olo, ohi = pl.pallas_call(
        kernel,
        grid=(LK, Bf),
        in_specs=[dspec, dspec, kspec, kspec] + [cspec] * 4,
        out_specs=(ospec, ospec),
        out_shape=(
            jax.ShapeDtypeStruct((Bf, 2, LK, nr, lanes), jnp.uint32,
                                 vma=_vma(dlo, dhi, klo, khi)),
            jax.ShapeDtypeStruct((Bf, 2, LK, nr, lanes), jnp.uint32,
                                 vma=_vma(dlo, dhi, klo, khi)),
        ),
        interpret=interpret,
    )(*_align_vma([dlo, dhi, klo, khi, qlo, qhi, ilo, ihi]))
    out = olo.astype(jnp.uint64) | (ohi.astype(jnp.uint64) << jnp.uint64(32))
    return out.reshape(lead + (2, LK, N))
