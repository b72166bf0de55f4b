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


def _scrape_hlo(txt: str) -> dict:
    """Per-collective op counts + payload bytes from optimized HLO text."""
    import re

    dtype_bytes = {"u64": 8, "s64": 8, "f64": 8, "u32": 4, "s32": 4,
                   "f32": 4, "u8": 1, "s8": 1, "pred": 1}
    out = {}
    for op in ("all-to-all", "all-reduce", "all-gather",
               "collective-permute"):
        total = count = 0
        for line in txt.splitlines():
            if f" {op}(" not in line or "=" not in line:
                continue
            lhs = line.split(f" {op}(")[0].split("=", 1)[-1]
            sz = 0
            for m in re.finditer(r"(\w+)\[([\d,]*)\]", lhs):
                s = dtype_bytes.get(m.group(1), 8)
                for dim in filter(None, m.group(2).split(",")):
                    s *= int(dim)
                sz += s
            total += sz
            count += 1
        out[op] = {"ops": count, "bytes": total}
    return out


def _round_collectives(n_dev: int) -> dict:
    """Build the sharded server round at D=n_dev and scrape its compiled
    HLO collective bytes (the falsifiable half of the scaling model)."""
    import numpy as np
    import jax.numpy as jnp

    from ppqsflhe_tpu.ckks.params import CkksParams as _P
    from ppqsflhe_tpu.parallel import sharded_scheme as ss
    from ppqsflhe_tpu.parallel.mesh import make_mesh

    n_r = 1 << 12
    p_r = _P.generate(n=n_r, mult_depth=2, scale_bits=40, dnum=2,
                      ntt_backend="fourstep")
    rmesh = make_mesh({"client": 1, "coef": n_dev})
    sctx = ss.ShardedEvalContext(p_r, rmesh)
    l = p_r.num_q
    B = 2 * n_dev
    rng = np.random.default_rng(0)
    qs = np.array(p_r.q_moduli, np.uint64)
    stacks = rng.integers(0, 1 << 59, size=(2, B, 2, l, n_r),
                          dtype=np.uint64) % qs[None, None, None, :, None]
    nd_k = len(sctx.digit_groups)
    LK = l + p_r.num_p
    rk = rng.integers(0, 1 << 59, size=(2, nd_k, 2, LK, n_r),
                      dtype=np.uint64) % np.array(
        sctx.moduli_qp, np.uint64)[None, None, None, :, None]
    out = ss.fedavg_round_sharded(sctx, jnp.asarray(stacks),
                                  jnp.asarray(rk[0]), jnp.asarray(rk[1]),
                                  float(p_r.scale))
    import jax

    jax.block_until_ready(out)
    sm = ss.eval_matrix(jnp.asarray(stacks), sctx.n1, sctx.n2)
    k1 = ss.eval_matrix(jnp.asarray(rk[0]), sctx.n1, sctx.n2)
    k2 = ss.eval_matrix(jnp.asarray(rk[1]), sctx.n1, sctx.n2)
    txt = "\n".join(
        fn.lower(sm, k1, k2).compile().as_text()
        for key, fn in sctx._jit_cache.items() if key[0] == "fedavg")
    return _scrape_hlo(txt)


def diff_model(n_dev: int) -> int:
    """VERDICT r4 #9: re-scrape the D=n_dev sharded round's collective
    bytes and fail loudly if they drift from the committed
    SCALING_MODEL.json — keeps the falsifiable half of the >=70% scaling
    claim honest as the sharded path evolves. Returns a shell exit code."""
    with open(os.path.join(REPO, "SCALING_MODEL.json")) as f:
        model = json.load(f)
    want = model["collective_bytes_per_round"].get(str(n_dev))
    if want is None:
        print(f"[diff] SCALING_MODEL.json has no D={n_dev} entry",
              file=sys.stderr)
        return 2
    got = _round_collectives(n_dev)
    drift = []
    for op, rec in want.items():
        g = got.get(op, {"ops": -1, "bytes": -1})
        if g["ops"] != rec["ops"] or g["bytes"] != rec["bytes"]:
            drift.append(
                "%s: model ops=%s bytes=%s vs measured ops=%s bytes=%s"
                % (op, rec["ops"], rec["bytes"], g["ops"], g["bytes"]))
    if drift:
        print("[diff] COLLECTIVE MODEL DRIFT at D=%d - the sharded path's "
              "communication volume no longer matches SCALING_MODEL.json; "
              "re-run bench_scaling.py to regenerate it (and re-derive the "
              "ICI efficiency claim in docs/PERF.md):" % n_dev,
              file=sys.stderr)
        for d in drift:
            print("  " + d, file=sys.stderr)
        return 1
    print(json.dumps({"metric": "collective_model_diff", "devices": n_dev,
                      "drift": 0, "collectives": got}))
    return 0


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

    # --- 3. the FULL sharded server round (client × coef mesh) -------------
    # Weak scaling over the coef axis: ciphertexts per client grow with D
    # (per-device work constant), 2 clients as in the reference round.
    import re

    from ppqsflhe_tpu.ckks.params import CkksParams as _P
    from ppqsflhe_tpu.parallel import sharded_scheme as ss

    n_r = 1 << 12
    p_r = _P.generate(n=n_r, mult_depth=2, scale_bits=40, dnum=2,
                      ntt_backend="fourstep")
    coef = n_dev
    rmesh = make_mesh({"client": 1, "coef": coef})
    sctx = ss.ShardedEvalContext(p_r, rmesh)
    l = p_r.num_q
    B = 2 * n_dev                        # per-device work constant
    qs = np.array(p_r.q_moduli, np.uint64)
    stacks = rng.integers(0, 1 << 59, size=(2, B, 2, l, n_r),
                          dtype=np.uint64) % qs[None, None, None, :, None]
    nd_k = len(sctx.digit_groups)
    LK = l + p_r.num_p
    rk = rng.integers(0, 1 << 59, size=(2, nd_k, 2, LK, n_r),
                      dtype=np.uint64) % np.array(
        sctx.moduli_qp, np.uint64)[None, None, None, :, None]

    def round_fn():
        return ss.fedavg_round_sharded(sctx, jnp.asarray(stacks),
                                       jnp.asarray(rk[0]), jnp.asarray(rk[1]),
                                       float(p_r.scale))

    agg_out, back_out = round_fn()
    jax.block_until_ready((agg_out, back_out))
    best_round = None
    for _ in range(3):
        t0 = time.time()
        for _ in range(max(1, REPS // 2)):
            out = round_fn()
        jax.block_until_ready(out)
        dt = (time.time() - t0) / max(1, REPS // 2)
        best_round = dt if best_round is None else min(best_round, dt)

    # collective-volume accounting straight from the compiled HLO: every
    # all-to-all / all-reduce / all-gather / collective-permute op's payload
    # bytes — the falsifiable inputs to the ICI model in docs/PERF.md.
    # fedavg_round_sharded caches its compiled shard_map on sctx; lower it
    # with the same (matrix-view) args and scrape the optimized HLO.
    coll_bytes = {}
    try:
        sm = ss.eval_matrix(jnp.asarray(stacks), sctx.n1, sctx.n2)
        k1 = ss.eval_matrix(jnp.asarray(rk[0]), sctx.n1, sctx.n2)
        k2 = ss.eval_matrix(jnp.asarray(rk[1]), sctx.n1, sctx.n2)
        txt = "\n".join(
            fn.lower(sm, k1, k2).compile().as_text()
            for key, fn in sctx._jit_cache.items() if key[0] == "fedavg")
        coll_bytes = _scrape_hlo(txt)
    except Exception as e:  # pragma: no cover - accounting is best-effort
        coll_bytes = {"error": str(e)[:120]}

    print(json.dumps({"devices": n_dev,
                      "ntt_ms": round(best_ntt * 1e3, 3),
                      "agg_ms": round(best_agg * 1e3, 3),
                      "round_ms": round(best_round * 1e3, 3),
                      "round_cts": B,
                      "collective_bytes": coll_bytes}))


def main() -> None:
    if "--one" in sys.argv:
        run_one(int(sys.argv[sys.argv.index("--one") + 1]))
        return
    if "--diff-one" in sys.argv:
        raise SystemExit(diff_model(int(sys.argv[sys.argv.index("--diff-one") + 1])))
    if "--diff" in sys.argv:
        d = int(sys.argv[sys.argv.index("--diff") + 1]) \
            if len(sys.argv) > sys.argv.index("--diff") + 1 else 8
        env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
                   XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                              + f" --xla_force_host_platform_device_count={d}").strip())
        r = subprocess.run([sys.executable, __file__, "--diff-one", str(d)],
                           env=env)
        raise SystemExit(r.returncode)

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
    eff_round = results[d0]["round_ms"] / results[dmax]["round_ms"]
    # The falsifiable half of the >=70% scaling claim (docs/PERF.md "Scaling
    # story"): commit the HLO-scraped per-collective byte counts so a real
    # TPU-slice run can diff measured traffic against this model.
    with open(os.path.join(REPO, "SCALING_MODEL.json"), "w") as f:
        json.dump({
            "generated_by": "bench_scaling.py",
            "platform": PLATFORM,
            "shape": {"ntt_n": N, "limbs": LIMBS, "round_n": 1 << 12,
                      "round_depth": 2, "dnum": 2},
            "collective_bytes_per_round": {
                str(d): results[d]["collective_bytes"] for d in DEVS},
            "round_cts": {str(d): results[d]["round_cts"] for d in DEVS},
            "ici_model": {
                "bytes_per_limb_transform": "l*N*8*(D-1)/D",
                "v5e_ici_GBps_per_link": 400,
                "predicted_efficiency_4_hosts": ">=0.75",
                "derivation": "docs/PERF.md: Scaling story",
            },
        }, f, indent=1)
    print(json.dumps({
        "metric": "weak_scaling_efficiency_ntt",
        "value": round(eff, 3),
        "round_value": round(eff_round, 3),
        "unit": "fraction",
        "devices": DEVS,
        "platform": PLATFORM,
        "ntt_ms": {d: results[d]["ntt_ms"] for d in DEVS},
        "agg_ms": {d: results[d]["agg_ms"] for d in DEVS},
        "round_ms": {d: results[d]["round_ms"] for d in DEVS},
        "round_cts": {d: results[d]["round_cts"] for d in DEVS},
        "collective_bytes": {d: results[d]["collective_bytes"] for d in DEVS},
        "note": ("virtual CPU mesh: 2 host cores emulate all devices, so time "
                 "grows ~linearly with D even at perfect weak scaling; run "
                 "with PPQSFLHE_SCALE_PLATFORM=tpu on a real slice for ICI "
                 "numbers" if PLATFORM == "cpu" else "real device mesh"),
    }))


if __name__ == "__main__":
    main()
