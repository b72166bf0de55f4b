#!/usr/bin/env python
"""Benchmark: the reference's server-side encrypted-aggregation round on TPU.

Measures the HE hot path of SURVEY.md §3.1 (hot loops #3-#4): with the
reference workload (2 clients × GRU weight payload → 27 ciphertexts each at
N=16384, 4 RNS limbs, Δ=2^40, HYBRID dnum=2):

    PRE client-1 → client-2 domain  (changeCipherDomain, 27 key switches)
    homomorphic FedAvg              (27 × EvalAdd + EvalMult(0.5) + rescale)
    PRE aggregate → client-1 domain (27 key switches)

Baseline: the authors' committed run shows this window took ~8 s on their
host (uploads 17:14:26/28 → aggregate served 17:14:35,
orchestration/metrics/comm_metrics.csv rows 10-13; BASELINE.md). vs_baseline
is baseline_ms / our_ms (higher = faster than reference).

Process structure: key generation / encryption (prep) and the correctness
decrypt (check) each run in a CPU-only subprocess — the TPU process loads
the prepared arrays and compiles/runs exactly ONE timed graph. (The axon
PJRT plugin deadlocks CPU-backend compiles in a dual-platform process;
subprocesses also keep the persistent compile caches per-backend clean.)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASELINE_SERVER_CRYPTO_MS = 8000.0
BACKEND = os.environ.get("PPQSFLHE_BENCH_BACKEND", "fourstep")
# default: the fused Pallas MXU-NTT kernel (4.9 ms/round on-chip vs 7.3 for
# 'xla' — docs/PERF.md); override with PPQSFLHE_BENCH_IMPL=xla|mxu|pallas
IMPL = os.environ.get("PPQSFLHE_BENCH_IMPL", "pallas_mxu")
N = 1 << 14


def _params(impl=None):
    from ppqsflhe_tpu.ckks.params import CkksParams

    return CkksParams.generate(n=N, mult_depth=2, scale_bits=40, dnum=2,
                               ntt_backend=BACKEND,
                               ntt_impl=impl if impl is not None else IMPL)


def _payload_vecs(slots):
    import numpy as np

    ref_w = "/root/reference/client/storage/client_1/private/sample_weights_c1.json"
    if os.path.exists(ref_w):
        with open(ref_w) as f:
            entries = json.load(f)["weights_summary"]
        vecs = []
        for e in entries:
            vals = np.asarray(e["values"], np.float64)
            vecs += [np.array([e["mean"]]), np.array([e["std_dev"]])]
            for c in range(max(1, -(-vals.size // slots))):
                vecs.append(vals[c * slots : (c + 1) * slots])
        return vecs
    rng = np.random.default_rng(0)
    return [rng.uniform(-1, 1, slots) for _ in range(27)]


def run_prep(out_path: str) -> None:
    import jax
    import numpy as np

    import ppqsflhe_tpu  # noqa: F401
    from ppqsflhe_tpu.ckks.scheme import CkksScheme
    from ppqsflhe_tpu.fl.api import _encrypt_batch

    sch = CkksScheme(_params(impl="xla"))   # CPU subprocess: no Mosaic
    vecs = _payload_vecs(sch.encoder.slots)
    k0 = jax.random.PRNGKey(7)
    sk1, pk1 = sch.keygen(jax.random.fold_in(k0, 1))
    sk2, pk2 = sch.keygen(jax.random.fold_in(k0, 2))
    rk12 = sch.rekey_gen(sk1, pk2, jax.random.fold_in(k0, 3))
    rk21 = sch.rekey_gen(sk2, pk1, jax.random.fold_in(k0, 4))
    cts1 = _encrypt_batch(sch, pk1, vecs, jax.random.fold_in(k0, 5))
    cts2 = _encrypt_batch(sch, pk2, vecs, jax.random.fold_in(k0, 6))
    np.savez(
        out_path,
        stack1=np.stack([np.asarray(c.data) for c in cts1]),
        stack2=np.stack([np.asarray(c.data) for c in cts2]),
        rk12=np.asarray(rk12.data), rk21=np.asarray(rk21.data),
        s2_int=np.asarray(sk2.s_int), scale=np.float64(cts1[0].scale),
        probe=np.asarray(vecs[2][:16], np.float64),
    )


def run_check(prep_path: str, agg_path: str) -> None:
    import jax.numpy as jnp
    import numpy as np

    import ppqsflhe_tpu  # noqa: F401
    from ppqsflhe_tpu.ckks.scheme import CkksScheme
    from ppqsflhe_tpu.ckks.types import Ciphertext, SecretKey
    from ppqsflhe_tpu.core import sampling

    sch = CkksScheme(_params(impl="xla"))   # CPU subprocess: no Mosaic
    z = np.load(prep_path)
    a = np.load(agg_path)
    all_idx = tuple(range(len(sch.ctx.moduli_qp)))
    s_int = z["s2_int"]
    coeff = sampling.signed_to_rns(jnp.asarray(s_int, jnp.int32), sch.ctx.moduli_qp)
    sk2 = SecretKey(s_eval=sch.ctx.ntt(coeff, all_idx), s_int=s_int)
    out_scale = float(a["scale"]) if "scale" in a else float(z["scale"])
    got = sch.decrypt(sk2, Ciphertext(jnp.asarray(a["agg2"]), scale=out_scale),
                      num=16)
    err = float(np.abs(np.asarray(got) - z["probe"][: len(got)]).max())
    print(json.dumps({"err": err}))


def main() -> None:
    if "--prep" in sys.argv:
        run_prep(sys.argv[sys.argv.index("--prep") + 1])
        return
    if "--check" in sys.argv:
        i = sys.argv.index("--check")
        run_check(sys.argv[i + 1], sys.argv[i + 2])
        return

    tmp = tempfile.mkdtemp(prefix="ppqsflhe_bench_")
    cpu_env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
                   PPQSFLHE_BENCH_IMPL="xla")
    # Prep artifacts (keys + encrypted payload) depend only on the parameter
    # set and the fixed PRNG seed — cache them next to the repo so repeated
    # driver runs skip the ~3 min CPU prep.
    cache_key = f"{BACKEND}_{N}"
    prep_path = os.path.join(REPO, ".bench_cache", f"prep_{cache_key}.npz")
    os.makedirs(os.path.dirname(prep_path), exist_ok=True)
    if os.path.exists(prep_path):
        print(f"[bench] backend={BACKEND}; reusing cached prep {prep_path}",
              file=sys.stderr)
    else:
        print(f"[bench] backend={BACKEND}; prepping in CPU subprocess…", file=sys.stderr)
        t0 = time.time()
        r = subprocess.run([sys.executable, __file__, "--prep", prep_path],
                           env=cpu_env, capture_output=True, text=True)
        if r.returncode != 0:
            if os.path.exists(prep_path):
                os.remove(prep_path)
            print(r.stderr[-2000:], file=sys.stderr)
            raise SystemExit("prep failed")
        print(f"[bench] prep done in {time.time()-t0:.1f}s", file=sys.stderr)

    import jax
    import jax.numpy as jnp
    import numpy as np

    import ppqsflhe_tpu  # noqa: F401
    from ppqsflhe_tpu.ckks import eval as ev
    from ppqsflhe_tpu.ckks.scheme import CkksScheme
    from ppqsflhe_tpu.ckks.types import Ciphertext, KeySwitchKey

    accel = jax.devices()[0]
    print(f"[bench] timed device: {accel}", file=sys.stderr)
    sch = CkksScheme(_params())
    z = np.load(prep_path)
    scale = float(z["scale"])
    put = lambda k: jax.device_put(jnp.asarray(z[k]), accel)
    stack1, stack2 = put("stack1"), put("stack2")
    # rekeys are long-lived: one Montgomery-form conversion halves the
    # per-ciphertext inner-product multiplies (ev.ksk_to_mont)
    rk12 = ev.ksk_to_mont(sch.ctx, KeySwitchKey(data=put("rk12"))).data
    rk21 = ev.ksk_to_mont(sch.ctx, KeySwitchKey(data=put("rk21"))).data

    # Lazy level management: LevelReduce — dropping TOP RNS limbs without
    # scaling — is a free, exact modulus switch (message+noise < Q_small/2
    # unchanged). The reference keeps full level throughout; nothing in a
    # pure-linear aggregation round needs that.
    #   PPQSFLHE_BENCH_LAZY=0  reference full-level schedule (~35 NTT/ct)
    #   PPQSFLHE_BENCH_LAZY=1  drop 1 limb; mult+rescale ÷2 (~23 NTT/ct)
    #   PPQSFLHE_BENCH_LAZY=2  drop to l=1; ÷2 as exact scale METADATA (0.5
    #     encoded at scale 2 is the constant 1 — no mult, no rescale):
    #     fewest transforms (~18/ct) but measured SLOWER (15.0 ms) —
    #     single-limb ops under-utilize the chip (docs/PERF.md).
    #   PPQSFLHE_BENCH_LAZY=3  drop 1 limb AND free ÷2: both key switches at
    #     l=2, no rescale (measured 14.8 ms — the un-shrunk second switch
    #     costs more than the saved rescale).
    #   PPQSFLHE_BENCH_LAZY=4  (default) = mode 1 with the rescale replaced
    #     by a free LevelReduce: PRE@l2 → add → ÷2 as scale metadata → drop
    #     limb → PRE@l1. Identical op shapes to mode 1, two fewer
    #     transforms per ciphertext (~21 NTT/ct).
    lazy = int(os.environ.get("PPQSFLHE_BENCH_LAZY", "4") or 0)
    L_full = sch.params.num_q
    drop = min(2 if lazy == 2 else min(lazy, 1), L_full - 1)
    free_div = lazy >= 2
    out_scale = scale * 2.0 if free_div else scale

    def server_round(s1, s2, k12, k21):
        from ppqsflhe_tpu.core.modarith import modadd

        def re_enc(d, rk):
            l = d.shape[1]
            q, _, _ = sch.ctx.limb_consts(sch.ctx.q_idx(l))
            d0, d1 = ev.keyswitch(sch.ctx, d[1],
                                  KeySwitchKey(data=rk, mont=True), l)
            return jnp.stack([modadd(d[0], d0, q), d1])

        def agg_pair(d1, d2):
            if drop:
                d1 = d1[:, : L_full - drop]     # LevelReduce before the switch
                d2 = d2[:, : L_full - drop]
            c1in2 = re_enc(d1, k12)
            s = ev.add(sch.ctx, Ciphertext(c1in2, scale), Ciphertext(d2, scale))
            if lazy >= 4:
                # free ÷2 (scale metadata) + free LevelReduce to l=1
                avg = Ciphertext(s.data[:, :-1], scale)
            elif free_div:
                avg = s                         # ÷2 is free: scale ×= 2 outside
            else:
                avg = ev.mult_scalar(sch.ctx, s, 0.5)
            return avg.data, re_enc(avg.data, k21)

        return jax.vmap(agg_pair)(s1, s2)

    fn = jax.jit(server_round)
    t0 = time.time()
    agg, agg_in1 = fn(stack1, stack2, rk12, rk21)
    np.asarray(agg[0, 0, 0, :4])     # host fetch = real sync (see below)
    print(f"[bench] server round compile+first run: {time.time()-t0:.1f}s",
          file=sys.stderr)

    # HONEST on-chip timing. Two facts about this environment (measured,
    # docs/PERF.md): (a) block_until_ready on the axon tunnel backend
    # returns BEFORE the computation finishes — only a device→host fetch
    # truly synchronizes; (b) every executable call pays ~25 ms of tunnel
    # dispatch no local deployment would pay. So: run R rounds INSIDE one
    # jit (lax.scan with a carry perturbation that makes every round
    # data-dependent on the previous one, and a full checksum so XLA cannot
    # dead-code anything), fetch the 8-byte checksum, and report the
    # MARGINAL cost between two R values — pure on-chip round time with the
    # dispatch overhead differenced out.
    def rounds_checksum(R):
        def run(s1, s2, k12, k21):
            def body(c, _):
                s1p = s1.at[0, 0, 0, 0].set(
                    (s1[0, 0, 0, 0] >> jnp.uint64(1)) + (c & jnp.uint64(1)))
                a, b = server_round(s1p, s2, k12, k21)
                chk = (a.astype(jnp.uint32).sum() +
                       b.astype(jnp.uint32).sum()).astype(jnp.uint64)
                return chk, None
            c, _ = jax.lax.scan(body, jnp.uint64(0), None, length=R)
            return c
        return jax.jit(run)

    def timed(R, reps=3):
        jf = rounds_checksum(R)
        np.asarray(jf(stack1, stack2, rk12, rk21))   # compile+warm
        best = None
        for _ in range(reps):
            t0 = time.time()
            np.asarray(jf(stack1, stack2, rk12, rk21))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return best

    # longer spread + more reps: the tunnel adds ±10% per-call jitter, so
    # a 20-round marginal with best-of-5 tightens the band (r4)
    # large-R anchors (r5 methodology, docs/PERF.md): both calls must be
    # compute-dominated — the ~25-33 ms tunnel floor is bimodal, so a
    # small-R anchor rides the floor and the marginal undercounts
    r_lo, r_hi = 20, 60
    t_lo, t_hi = timed(r_lo, reps=5), timed(r_hi, reps=5)
    ms = float((t_hi - t_lo) / (r_hi - r_lo) * 1e3)
    print(f"[bench] call(R={r_lo})={t_lo*1e3:.1f} ms, call(R={r_hi})="
          f"{t_hi*1e3:.1f} ms -> on-chip {ms:.1f} ms/round "
          f"(dispatch overhead {t_lo*1e3 - r_lo*ms:.1f} ms/call)",
          file=sys.stderr)

    agg_path = os.path.join(tmp, "agg.npz")
    np.savez(agg_path, agg2=np.asarray(agg[2]), scale=np.float64(out_scale))
    r = subprocess.run([sys.executable, __file__, "--check", prep_path, agg_path],
                       env=cpu_env, capture_output=True, text=True)
    err = json.loads(r.stdout.strip().splitlines()[-1])["err"] if r.returncode == 0 else float("inf")
    ok = err < 1e-3
    print(f"[bench] correct={ok} err={err:.2e}", file=sys.stderr)

    print(json.dumps({
        "metric": "server_encrypted_aggregation_ms_per_round",
        "value": round(ms, 1),
        "unit": "ms",
        "vs_baseline": round(BASELINE_SERVER_CRYPTO_MS / ms, 2),
    }))


if __name__ == "__main__":
    main()
