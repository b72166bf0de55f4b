#!/usr/bin/env python
"""Kernel microbenchmarks on the attached TPU: NTT throughput per chip
(the BASELINE.json north-star metric) across the implementations:

  core    — stage-unrolled radix-2 NTT on XLA's u64 emulation (core/ntt.py)
  4step   — four-step factorization, XLA u32-pair path (ops/fourstep.py)
  pallas  — the fused Pallas kernel (ops/pallas_ntt.py)
  mxu     — int8 digit-matmul on the MXU (ops/mxu_ntt.py)

Timing methodology (docs/PERF.md): on the axon tunnel backend,
``block_until_ready`` returns before the computation finishes and every
executable call pays ~25 ms of dispatch. So each impl runs R transforms
chained INSIDE one jit (lax.scan — ntt output feeds the next input, so
nothing can be dead-coded or overlapped away), the result is synced by a
host fetch of an 8-byte checksum, and the reported number is the MARGINAL
cost between two scan lengths — pure on-chip time. Every impl's scan output
is checked bit-equal against the 4step reference chain.

Reports µs/limb-NTT + NTT/s (stderr) and a summary JSON line per config.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Large-R anchors (r5 methodology correction, docs/PERF.md): the tunnel's
# per-call floor is ~25-33 ms and BIMODAL, so small-R anchors sit ON the
# floor and the marginal undercounts (r4's 10.31 us @2^16 reproduced as a
# 2->14 artifact; steady state is 14.6-16.5). Both anchors must be
# compute-dominated: calls of >=60 ms make the +-8 ms jitter <15% of the
# marginal.
R_LO, R_HI = 100, 300


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import ppqsflhe_tpu  # noqa: F401
    from ppqsflhe_tpu.core import primes
    from ppqsflhe_tpu.core.ntt import NttBasis
    from ppqsflhe_tpu.ops import mxu_ntt as M
    from ppqsflhe_tpu.ops.pallas_ntt import FourStepNtt

    dev = jax.devices()[0]
    print(f"[kbench] device: {dev}", file=sys.stderr)

    for n, L, B in ((1 << 14, 4, 27), (1 << 16, 4, 8)):
        moduli = [primes.first_prime_down(59, 2 * n)] + primes.prime_chain(40, 3, 2 * n)
        moduli = moduli[:L]
        psis = [primes.root_of_unity(2 * n, q) for q in moduli]
        basis = NttBasis(n, moduli, psis)
        fs = FourStepNtt(n, moduli, psis)
        mtabs = [M.MxuNttTables.build(n, q, p) for q, p in zip(moduli, psis)]
        rng = np.random.default_rng(0)
        x = np.stack([
            np.stack([rng.integers(0, q, n, dtype=np.uint64) for q in moduli])
            for _ in range(B)
        ])
        xd = jax.device_put(jnp.asarray(x), dev)

        impls = {
            "core": lambda a: basis.ntt(a),
            "4step": lambda a: fs.ntt(a, implementation="xla"),
            "pallas": lambda a: fs.ntt(a, implementation="pallas"),
            "mxu": lambda a: jnp.stack(
                [M.mxu_ntt_limb(a[:, i], mtabs[i]) for i in range(L)], axis=1),
        }
        # N <= 2^15: fully fused single kernel; above: streamed two-kernel
        # variant (PallasMxuNttBig) — both behind the same impl name
        impls["pallas_mxu"] = lambda a: fs.ntt(a, implementation="pallas_mxu")

        def scan_fn(f1, R):
            def run(a):
                def body(c, _):
                    return f1(c), None
                out, _ = jax.lax.scan(body, a, None, length=R)
                # checksum forces full materialization; host fetch syncs
                return out, out.astype(jnp.uint32).sum()
            return jax.jit(run)

        results = {}
        ref_chain = None
        for name, f1 in impls.items():
            try:
                jf_lo, jf_hi = scan_fn(f1, R_LO), scan_fn(f1, R_HI)
                t0 = time.time()
                out_lo, _ = jf_lo(xd)
                chain = np.asarray(out_lo)
                compile_s = time.time() - t0
                # core's eval ordering differs (std bit-reversed); compare
                # the kernel-order impls against the 4step chain
                if name == "4step":
                    ref_chain = chain
                elif name != "core" and ref_chain is not None \
                        and not np.array_equal(chain, ref_chain):
                    raise AssertionError("scan output mismatch vs 4step")

                def timed(jf):
                    np.asarray(jf(xd)[1])
                    best = None
                    for _ in range(3):
                        t0 = time.time()
                        np.asarray(jf(xd)[1])
                        dt = time.time() - t0
                        best = dt if best is None else min(best, dt)
                    return best

                t_lo, t_hi = timed(jf_lo), timed(jf_hi)
                per_tf_us = (t_hi - t_lo) / (R_HI - R_LO) / (B * L) * 1e6
                tf_s = (B * L) / ((t_hi - t_lo) / (R_HI - R_LO))
                results[name] = per_tf_us
                print(f"[kbench] N=2^{n.bit_length()-1} L={L} B={B} {name:7s}: "
                      f"{per_tf_us:8.2f} us/limb-NTT on-chip  {tf_s:9.0f} NTT/s"
                      f"  (compile {compile_s:.1f}s, dispatch "
                      f"{(t_lo - R_LO*(t_hi-t_lo)/(R_HI-R_LO))*1e3:.0f} ms/call)",
                      file=sys.stderr)
            except Exception as e:
                print(f"[kbench] {name} FAILED: {type(e).__name__}: {str(e)[:200]}",
                      file=sys.stderr)
                results[name] = None
        print(json.dumps({"metric": f"ntt_us_per_limb_N{n}", "results": results}))

    _bench_keyswitch(jax, jnp, np, dev)
    # the reference's true 4-tower chain (60/40/40 + 20-bit FLEXIBLEAUTOEXT)
    _bench_keyswitch(jax, jnp, np, dev, extra_mod_bits=20)


def _bench_keyswitch(jax, jnp, np, dev, extra_mod_bits: int = 0):
    """The key-switch kernel north-star (BASELINE.md:51): full HYBRID
    keyswitch (iNTT + decompose + HPS base-extend + NTT + KSK inner product
    + ModDown) on B=27 reference-shaped ciphertext components, measured
    on-chip via the same scan-marginal method, per ntt implementation.
    Outputs are checked bit-equal across implementations.
    ``extra_mod_bits=20`` adds the FLEXIBLEAUTOEXT extra prime → the
    reference's true 4-tower chain (SURVEY.md §2.3)."""
    import ppqsflhe_tpu  # noqa: F401
    from ppqsflhe_tpu.ckks import eval as ev
    from ppqsflhe_tpu.ckks.params import CkksParams
    from ppqsflhe_tpu.ckks.scheme import CkksScheme
    from ppqsflhe_tpu.ckks.types import KeySwitchKey

    n, B = 1 << 14, 27
    results = {}
    ref_out = None
    for impl in ("xla", "mxu", "pallas_mxu"):
        sch = CkksScheme(CkksParams.generate(
            n=n, mult_depth=2, scale_bits=40, dnum=2,
            extra_mod_bits=extra_mod_bits,
            ntt_backend="fourstep", ntt_impl=impl))
        L = sch.params.num_q
        rng = np.random.default_rng(0)
        qs = np.array(sch.params.q_moduli, np.uint64)
        c = rng.integers(0, 1 << 59, size=(B, L, n), dtype=np.uint64) \
            % qs[None, :, None]
        LK = len(sch.ctx.moduli_qp)
        nd = len(sch.ctx.digit_groups)
        rk = rng.integers(0, 1 << 59, size=(nd, 2, LK, n), dtype=np.uint64) \
            % np.array(sch.ctx.moduli_qp, np.uint64)[None, None, :, None]
        cd = jax.device_put(jnp.asarray(c), dev)
        # production config: long-lived keys are converted to Montgomery
        # form ONCE (ev.ksk_to_mont) — halves the inner-product multiplies
        # of every switch (round-3 PERF.md numbers predate this; VERDICT
        # r3 #2 asked for the re-measure)
        rkd = ev.ksk_to_mont(
            sch.ctx, KeySwitchKey(data=jax.device_put(jnp.asarray(rk), dev))).data

        def ks_all(cs, k):
            def one(ci):
                d0, d1 = ev.keyswitch(sch.ctx, ci,
                                      KeySwitchKey(data=k, mont=True), L)
                return jnp.stack([d0, d1])
            return jax.vmap(one)(cs)

        def scan_fn(R):
            def run(cs, k):
                def body(carry, _):
                    cs2 = cs.at[0, 0, 0].set(
                        (cs[0, 0, 0] >> jnp.uint64(1)) + (carry & jnp.uint64(1)))
                    o = ks_all(cs2, k)
                    return (o.astype(jnp.uint32).sum()).astype(jnp.uint64), None
                ch, _ = jax.lax.scan(body, jnp.uint64(0), None, length=R)
                return ch
            return jax.jit(run)

        try:
            out = np.asarray(jax.jit(ks_all)(cd, rkd))
            if ref_out is None:
                ref_out = out
            elif not np.array_equal(out, ref_out):
                raise AssertionError("keyswitch output mismatch vs xla impl")
            # large-R anchors (see R_LO/R_HI note): keyswitch rounds are
            # ~3.7 ms at B=27, so 20/60 puts both calls well off the floor
            jf_lo, jf_hi = scan_fn(20), scan_fn(60)

            def timed(jf):
                np.asarray(jf(cd, rkd))
                best = None
                for _ in range(3):
                    t0 = time.time()
                    np.asarray(jf(cd, rkd))
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
                return best

            t_lo, t_hi = timed(jf_lo), timed(jf_hi)
            per_ks_us = (t_hi - t_lo) / 40 / B * 1e6
            results[impl] = per_ks_us
            print(f"[kbench] keyswitch N=2^14 L={L} B={B} mont-keys {impl:4s}: "
                  f"{per_ks_us:8.1f} us/keyswitch on-chip "
                  f"({B*40/(t_hi-t_lo):7.0f} keyswitch/s)", file=sys.stderr)
        except Exception as e:
            print(f"[kbench] keyswitch {impl} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", file=sys.stderr)
            results[impl] = None
    print(json.dumps({"metric": f"keyswitch_us_N16384_L{len(sch.params.q_moduli)}_montkeys",
                      "results": results}))


if __name__ == "__main__":
    main()
