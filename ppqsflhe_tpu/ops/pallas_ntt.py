"""Fused four-step NTT as a Pallas TPU kernel (+ identical XLA fallback).

One kernel invocation per RNS limb (grid=(L,)) keeps the whole limb
(N ≤ 2^16 → ≤ 512 KB as u32 pairs) resident in VMEM across ALL stages —
twist, 2× column NTT, twiddle, transpose — with zero HBM round-trips
between stages, unlike the stage-by-stage XLA path. All arithmetic is the
u32-pair Shoup/add/sub from ops/u32pair.py (no 64-bit ops inside the
kernel; Mosaic lanes are 32-bit).

`implementation='xla'` runs the same body as plain jnp (used on CPU, in
tests, and as a safety fallback).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import u32pair as up
from .fourstep import (FourStepTables, intt_body, intt_body_cg,
                       kernel_to_std, ntt_body, ntt_body_cg)

_ELEM_TABS = ("twist", "itwist", "twiddle", "itwiddle")
_STAGE_TABS = ("pgs1", "pgs2", "pct1", "pct2")


class FourStepNtt:
    def __init__(self, n: int, moduli: Sequence[int], psis: Sequence[int]):
        self.n = n
        self.moduli = tuple(int(q) for q in moduli)
        self.tabs = [FourStepTables.build(n, q, p) for q, p in zip(moduli, psis)]
        self.n1, self.n2 = self.tabs[0].n1, self.tabs[0].n2
        # stacked tables (L, ...) for the pallas path
        self._stacked = {}
        for name in _ELEM_TABS + _STAGE_TABS:
            parts = [getattr(t, name) for t in self.tabs]
            self._stacked[name] = tuple(
                np.stack([p[i] for p in parts]) for i in range(4)
            )
        self._q = np.stack([
            np.array([[t.q_pair[0]]], np.uint32) for t in self.tabs
        ]), np.stack([
            np.array([[t.q_pair[1]]], np.uint32) for t in self.tabs
        ])
        self.perm_to_std = kernel_to_std(n)          # std[b] = kernel[perm[b]]
        self.perm_from_std = np.argsort(self.perm_to_std)
        self._psis = tuple(int(p) for p in psis)
        self._mxu_tabs = {}                          # limb idx → MxuNttTables
        self._pmxu = None                            # lazy PallasMxuNtt

    def pallas_mxu(self):
        """Lazily-built fused Pallas MXU-NTT runner (ops/pallas_mxu_ntt.py).
        Per-digit-count groups route independently (r5): a group whose
        stage matrices + working set fit the scoped-VMEM budget runs the
        fully fused single kernel; over-budget groups (the nd=9 60-bit
        limb at N >= 2^15 — measured 17.06 MB vs the 16 MB default scope)
        stream through the two-kernel PallasMxuNttBig pair. Raises
        ValueError for chains without the uniform redc/4 plan — callers
        fall back to implementation='mxu'."""
        if self._pmxu is None:
            from .pallas_mxu_ntt import PallasMxuNtt

            self._pmxu = PallasMxuNtt(self.n, self.moduli, self._psis)
        return self._pmxu

    def mxu_tables(self, i: int):
        """Lazily-built digit-matmul tables for limb i (ops/mxu_ntt.py)."""
        if i not in self._mxu_tabs:
            from .mxu_ntt import MxuNttTables

            self._mxu_tabs[i] = MxuNttTables.build(
                self.n, self.moduli[i], self._psis[i])
        return self._mxu_tabs[i]

    # -- shared body dispatch ----------------------------------------------

    def _run(self, x64, forward: bool, implementation: str, idx=None):
        L = x64.shape[-2]
        lead = x64.shape[:-2]
        x = x64.reshape((-1, L, self.n))
        sel = list(range(len(self.tabs))) if idx is None else list(idx)
        assert len(sel) == L, (len(sel), L)
        if implementation == "pallas_mxu":
            pm = self.pallas_mxu()
            out = (pm.ntt if forward else pm.intt)(x, idx=tuple(sel))
        elif implementation == "mxu":
            from .mxu_ntt import mxu_intt_limb, mxu_ntt_limb

            fn = mxu_ntt_limb if forward else mxu_intt_limb
            out = jnp.stack(
                [fn(x[:, k], self.mxu_tables(i)) for k, i in enumerate(sel)],
                axis=1)
        elif implementation == "pallas":
            stacked = self._stacked
            qpair = self._q
            if idx is not None:
                stacked = {
                    k: tuple(a[sel] for a in v) for k, v in self._stacked.items()
                }
                qpair = (self._q[0][sel], self._q[1][sel])
            out = _pallas_transform(x, stacked, qpair, self.n1, self.n2, forward)
        else:
            out = _xla_transform(x, [self.tabs[i] for i in sel],
                                 self.n1, self.n2, forward)
        return out.reshape(lead + (L, self.n))

    def ntt(self, x64, implementation: str = "pallas", idx=None):
        """coeff (natural) → eval (kernel order). u64[..., L, N]. ``idx``
        selects a static limb subset of the precomputed moduli."""
        return self._run(x64, True, implementation, idx)

    def intt(self, x64, implementation: str = "pallas", idx=None):
        return self._run(x64, False, implementation, idx)


# ---------------------------------------------------------------------------
# XLA fallback: same body, loop over limbs
# ---------------------------------------------------------------------------

def _xla_transform(x, tabs, n1, n2, forward):  # x: (B, L, N) u64
    outs = []
    for i, t in enumerate(tabs):
        def one(v64, t=t):
            lo, hi = up.split64(v64.reshape(n1, n2) if forward else v64.reshape(n2, n1))
            lo2, hi2 = (ntt_body if forward else intt_body)(lo, hi, t)
            return up.join64(lo2, hi2).reshape(-1)
        outs.append(jax.vmap(one)(x[:, i]))
    return jnp.stack(outs, axis=1)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _pallas_transform(x, stacked, qpair, n1, n2, forward, bblk: int = 1):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, N = x.shape
    xlo = (x & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    xhi = (x >> jnp.uint64(32)).astype(jnp.uint32)
    shape_in = (n1, n2) if forward else (n2, n1)
    shape_out = (n2, n1) if forward else (n1, n2)
    xlo = xlo.reshape(B, L, *shape_in)
    xhi = xhi.reshape(B, L, *shape_in)
    # bblk batches several polys per kernel instance. Measured on v5e:
    # bblk=1 is FASTEST (24.2 us/transform vs 28.9 at 4, 32.0 at 8) — bigger
    # blocks shrink Pallas's cross-grid-step double buffering, which hides
    # the HBM traffic better than intra-instance batching amortizes control
    # flow. Kept as a knob; ragged edges are handled by Pallas block padding.
    bblk = max(1, min(bblk, B))

    # Index-map constants MUST be i32: under jax_enable_x64 a python 0 traces
    # as i64 and Mosaic fails to legalize the index-map func.return.
    Z = np.int32(0)
    tab_names = ("twist", "twiddle", "pgs1", "pgs2") if forward else (
        "itwist", "itwiddle", "pct1", "pct2")
    tab_arrays = []
    tab_specs = []
    for name in tab_names:
        for arr in stacked[name]:
            # elementwise tables are (L, n1, n2) 3-D; Pease stage tables are
            # (L, S, m/2, 1) 4-D — one block per limb either way.
            tab_arrays.append(jnp.asarray(arr))
            blk = (1,) + arr.shape[1:]
            idx_map = (lambda b, l: (l, Z, Z)) if arr.ndim == 3 else (
                lambda b, l: (l, Z, Z, Z))
            tab_specs.append(pl.BlockSpec(blk, idx_map, memory_space=pltpu.VMEM))
    qlo_arr, qhi_arr = (jnp.asarray(q) for q in qpair)   # (L,1,1)
    qspec = pl.BlockSpec((1, 1, 1), lambda b, l: (l, Z, Z), memory_space=pltpu.VMEM)

    def kernel(xlo_ref, xhi_ref, *refs):
        tab_refs = refs[:-4]
        qlo_ref, qhi_ref, olo_ref, ohi_ref = refs[-4:]
        idx = 0
        tabs = {}
        for name in tab_names:
            vals = []
            for _ in range(4):
                vals.append(tab_refs[idx][...][0])   # drop limb block dim
                idx += 1
            tabs[name] = tuple(vals)
        qlo = qlo_ref[0, 0, 0]
        qhi = qhi_ref[0, 0, 0]
        lo = xlo_ref[...][:, 0]                      # (bblk, *shape_in)
        hi = xhi_ref[...][:, 0]
        if forward:
            t = _KTabs(tabs["twist"], tabs["twiddle"], tabs["pgs1"],
                       tabs["pgs2"], (qlo, qhi), n1, n2)
            olo, ohi = ntt_body_cg(lo, hi, t)
        else:
            t = _KTabs(tabs["itwist"], tabs["itwiddle"], tabs["pct1"],
                       tabs["pct2"], (qlo, qhi), n1, n2, forward=False)
            olo, ohi = intt_body_cg(lo, hi, t)
        olo_ref[...] = olo[:, None]
        ohi_ref[...] = ohi[:, None]

    out_spec = pl.BlockSpec((bblk, 1, *shape_out), lambda b, l: (b, l, Z, Z),
                            memory_space=pltpu.VMEM)
    in_spec_x = pl.BlockSpec((bblk, 1, *shape_in), lambda b, l: (b, l, Z, Z),
                             memory_space=pltpu.VMEM)

    olo, ohi = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(B, bblk), L),
        in_specs=[in_spec_x, in_spec_x] + tab_specs + [qspec, qspec],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, L, *shape_out), jnp.uint32),
            jax.ShapeDtypeStruct((B, L, *shape_out), jnp.uint32),
        ),
    )(xlo, xhi, *tab_arrays, qlo_arr, qhi_arr)
    out = olo.astype(jnp.uint64) | (ohi.astype(jnp.uint64) << jnp.uint64(32))
    return out.reshape(B, L, N)


class _KTabs:
    """Duck-typed FourStepTables view for the kernel body."""

    def __init__(self, twist, twiddle, s1, s2, q_pair, n1, n2, forward=True):
        if forward:
            self.twist, self.twiddle, self.pgs1, self.pgs2 = twist, twiddle, s1, s2
        else:
            self.itwist, self.itwiddle, self.pct1, self.pct2 = twist, twiddle, s1, s2
        self.q_pair = q_pair
        self.n1, self.n2 = n1, n2
