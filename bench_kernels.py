#!/usr/bin/env python
"""Kernel microbenchmarks on the attached TPU: NTT throughput per chip
(the BASELINE.json north-star metric) across the three implementations:

  core    — stage-unrolled radix-2 NTT on XLA's u64 emulation (core/ntt.py)
  4step   — four-step factorization, XLA u32-pair path (ops/fourstep.py)
  pallas  — the fused Pallas kernel (ops/pallas_ntt.py)

Reports transforms/s and effective bandwidth for each (stderr), plus a
summary JSON line per config. Not the driver bench (see bench.py).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import ppqsflhe_tpu  # noqa: F401
    from ppqsflhe_tpu.core import primes
    from ppqsflhe_tpu.core.ntt import NttBasis
    from ppqsflhe_tpu.ops.pallas_ntt import FourStepNtt

    dev = jax.devices()[0]
    print(f"[kbench] device: {dev}", file=sys.stderr)

    for n, L, B in ((1 << 14, 4, 27), (1 << 16, 4, 8)):
        moduli = [primes.first_prime_down(59, 2 * n)] + primes.prime_chain(40, 3, 2 * n)
        moduli = moduli[:L]
        psis = [primes.root_of_unity(2 * n, q) for q in moduli]
        basis = NttBasis(n, moduli, psis)
        fs = FourStepNtt(n, moduli, psis)
        rng = np.random.default_rng(0)
        x = np.stack([
            np.stack([rng.integers(0, q, n, dtype=np.uint64) for q in moduli])
            for _ in range(B)
        ])
        xd = jax.device_put(jnp.asarray(x), dev)

        impls = {
            "core": jax.jit(lambda a: basis.ntt(a)),
            "4step": jax.jit(lambda a: fs.ntt(a, implementation="xla")),
            "pallas": jax.jit(lambda a: fs.ntt(a, implementation="pallas")),
            "mxu": jax.jit(lambda a: fs.ntt(a, implementation="mxu")),
        }
        ref_out = None
        results = {}
        for name, fn in impls.items():
            try:
                t0 = time.time()
                out = fn(xd)
                jax.block_until_ready(out)
                compile_s = time.time() - t0
                if name == "4step":
                    ref_out = np.asarray(out)
                elif ref_out is not None and not np.array_equal(
                        np.asarray(out), ref_out):
                    raise AssertionError("output mismatch vs 4step")
                reps = 20
                t0 = time.time()
                for _ in range(reps):
                    out = fn(xd)
                jax.block_until_ready(out)
                dt = (time.time() - t0) / reps
                per_tf_us = dt / (B * L) * 1e6
                tf_s = B * L / dt
                results[name] = per_tf_us
                print(f"[kbench] N=2^{n.bit_length()-1} L={L} B={B} {name:7s}: "
                      f"{per_tf_us:8.1f} us/limb-NTT  {tf_s:9.0f} NTT/s  "
                      f"(compile {compile_s:.1f}s)", file=sys.stderr)
            except Exception as e:
                print(f"[kbench] {name} FAILED: {type(e).__name__}: {str(e)[:200]}",
                      file=sys.stderr)
                results[name] = None
        print(json.dumps({"metric": f"ntt_us_per_limb_N{n}", "results": results}))


if __name__ == "__main__":
    main()
