#!/usr/bin/env python
"""Scaling study (BASELINE.md north-star row "scaling efficiency"):
per-device throughput of the framework's two mesh-parallel compute paths as
the mesh grows, at fixed per-device work (weak scaling):

  1. coefficient-sharded four-step NTT (`ops/sharded_ntt.ShardedNtt`) —
     the sequence-parallel axis; exactly ONE all-to-all per transform.
  2. multikey encrypted aggregation (`ckks/multikey.aggregate_sharded`) —
     the client (FL data-parallel) axis; ONE modular psum per round.

Each device count runs in its own subprocess because
`--xla_force_host_platform_device_count` is fixed at backend init. On this
single-chip dev box the mesh is the virtual CPU mesh (collective structure
and weak-scaling behavior are real; absolute ops/s are not TPU numbers —
2 host cores emulate all devices, so ideal weak scaling shows as time ∝ D
here). On a real slice, run with PPQSFLHE_SCALE_PLATFORM=tpu to time the
same code over ICI.

Prints ONE JSON line:
  {"metric": "weak_scaling_efficiency", "value": …, "unit": "fraction",
   "devices": [...], "ntt_ms": {...}, "agg_ms": {...}, "platform": "..."}
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

DEVS = [int(d) for d in os.environ.get("PPQSFLHE_SCALE_DEVS", "1,2,4,8").split(",")]
PLATFORM = os.environ.get("PPQSFLHE_SCALE_PLATFORM", "cpu")
N = int(os.environ.get("PPQSFLHE_SCALE_N", str(1 << 14)))
LIMBS = 4
REPS = int(os.environ.get("PPQSFLHE_SCALE_REPS", "10"))


def run_one(n_dev: int) -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    import ppqsflhe_tpu  # noqa: F401
    from ppqsflhe_tpu.ckks.params import CkksParams
    from ppqsflhe_tpu.ckks.scheme import CkksScheme
    from ppqsflhe_tpu.ckks import multikey
    from ppqsflhe_tpu.core import primes
    from ppqsflhe_tpu.ops.sharded_ntt import ShardedNtt
    from ppqsflhe_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) >= n_dev, (n_dev, jax.devices())

    # --- 1. coefficient-sharded NTT, weak scaling: batch grows with D ------
    moduli = [primes.first_prime_down(59, 2 * N)] + [
        primes.first_prime_down(40 + i, 2 * N) for i in range(LIMBS - 1)
    ]
    psis = [primes.root_of_unity(2 * N, q) for q in moduli]
    mesh = make_mesh({"coef": n_dev})
    sn = ShardedNtt(N, moduli, psis, mesh)
    rng = np.random.default_rng(0)
    # per-device work constant: n_dev polys of L limbs each. ShardedNtt's
    # tables are per-limb, so extra polys ride as separate transforms in one
    # jitted graph (NOT packed into the limb dim — that broadcasts wrong).
    x = np.stack([
        np.stack([rng.integers(0, q, N, dtype=np.uint64) for q in moduli])
        for _ in range(n_dev)
    ]).reshape(n_dev, LIMBS, sn.n1, sn.n2)
    xm = jnp.asarray(x)
    fwd = jax.jit(lambda xs: jnp.stack([sn.ntt(xs[i]) for i in range(xs.shape[0])]))
    y = fwd(xm)
    y.block_until_ready()
    best_ntt = None
    for _ in range(3):
        t0 = time.time()
        for _ in range(REPS):
            y = fwd(xm)
        y.block_until_ready()
        dt = (time.time() - t0) / REPS
        best_ntt = dt if best_ntt is None else min(best_ntt, dt)

    # --- 2. multikey aggregation over the client axis, weak scaling --------
    # clients grow with D (2 clients per device), payload fixed per client.
    sch = CkksScheme(CkksParams.generate(n=256, mult_depth=1, scale_bits=40, dnum=2))
    l = sch.params.num_q
    B = 8
    n_clients = 2 * n_dev
    cmesh = make_mesh({"client": n_dev})
    stack = np.stack([
        np.stack([
            np.stack([rng.integers(0, q, (2, 256), dtype=np.uint64)
                      for q in sch.params.q_moduli], axis=1)
            for _ in range(B)
        ])
        for _ in range(n_clients)
    ])  # (clients, B, 2, l, n)
    arr = jnp.asarray(stack)
    agg = lambda: multikey.aggregate_sharded(
        sch.ctx, arr, cmesh, sch.params.scale, n_clients)
    out = agg()
    out.data.block_until_ready()
    best_agg = None
    for _ in range(3):
        t0 = time.time()
        for _ in range(REPS):
            out = agg()
        out.data.block_until_ready()
        dt = (time.time() - t0) / REPS
        best_agg = dt if best_agg is None else min(best_agg, dt)

    print(json.dumps({"devices": n_dev,
                      "ntt_ms": round(best_ntt * 1e3, 3),
                      "agg_ms": round(best_agg * 1e3, 3)}))


def main() -> None:
    if "--one" in sys.argv:
        run_one(int(sys.argv[sys.argv.index("--one") + 1]))
        return

    results = {}
    for d in DEVS:
        env = dict(os.environ)
        if PLATFORM == "cpu":
            env.update(JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
                       XLA_FLAGS=(env.get("XLA_FLAGS", "")
                                  + f" --xla_force_host_platform_device_count={d}").strip())
        r = subprocess.run([sys.executable, __file__, "--one", str(d)],
                           env=env, capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"scaling run D={d} failed")
        row = json.loads(r.stdout.strip().splitlines()[-1])
        results[d] = row
        print(f"[scaling] D={d}: ntt {row['ntt_ms']} ms, agg {row['agg_ms']} ms",
              file=sys.stderr)

    d0 = DEVS[0]
    dmax = DEVS[-1]
    # weak scaling: per-device work is constant, so efficiency = t(D0)/t(Dmax)
    eff = results[d0]["ntt_ms"] / results[dmax]["ntt_ms"]
    print(json.dumps({
        "metric": "weak_scaling_efficiency_ntt",
        "value": round(eff, 3),
        "unit": "fraction",
        "devices": DEVS,
        "platform": PLATFORM,
        "ntt_ms": {d: results[d]["ntt_ms"] for d in DEVS},
        "agg_ms": {d: results[d]["agg_ms"] for d in DEVS},
        "note": ("virtual CPU mesh: 2 host cores emulate all devices, so time "
                 "grows ~linearly with D even at perfect weak scaling; run "
                 "with PPQSFLHE_SCALE_PLATFORM=tpu on a real slice for ICI "
                 "numbers" if PLATFORM == "cpu" else "real device mesh"),
    }))


if __name__ == "__main__":
    main()
