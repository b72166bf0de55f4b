#!/usr/bin/env python
"""BASELINE.json config 5: full multikey FL round — 16 clients × 1M-param
LSTM weights: PRE every non-hub client into the hub domain, homomorphic
FedAvg, PRE the aggregate back to every client. Reports
encrypted-aggregation rounds/sec on the attached TPU.

The plaintext payload is the stacked-LSTM export (train/lstm.py, 1,091,101
parameters → 138 value + 16 scalar ciphertexts per client at batch 8192).
Prep (16 keygens, 30 rekeys, 2464 encryptions) runs in a CPU subprocess and
is cached under .bench_cache/ — the TPU process times only the protocol.

Round-3 design (VERDICT r2 #3):
- DEVICE-RESIDENT: rekeys and ciphertext stacks are staged to HBM once
  (~2 GB at the lazy level; v5e holds 16 GB) — the round is pure compute,
  ONE jit built from two lax.scans over the client axis (a keyswitch body
  compiles once, not 30 times).
- HONEST TIMING: rounds are chained inside the jit (outer lax.scan with a
  data-dependent carry + full checksum; block_until_ready does not truly
  block on the axon tunnel backend) and the metric is the marginal cost
  between two scan lengths — on-chip time with dispatch differenced out.
- SELF-VERIFYING: the SAME process writes the round's aggregate, and a
  --check subprocess (CPU backend) decrypts it against the plaintext mean;
  the JSON line carries correct/err from this run.
- The one-time staging H2D seconds are reported separately: on this
  environment the host→device path is an ~80 MB/s tunnel; a production
  deployment streams fresh ciphertexts per round over PCIe at >10 GB/s and
  overlaps the next client's H2D with the current client's compute
  (PPQSFLHE_MK_STREAM=1 measures that streaming schedule here).

Prints ONE JSON line {"metric", "value", "unit", "clients", "params", ...}.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

N_CLIENTS = int(os.environ.get("PPQSFLHE_MK_CLIENTS", "16"))
CACHE = os.path.join(REPO, ".bench_cache", f"multikey_{N_CLIENTS}.npz")


def _params():
    from ppqsflhe_tpu.ckks.params import CkksParams

    return CkksParams.generate(
        n=1 << 14, mult_depth=2, scale_bits=40, dnum=2,
        ntt_backend=os.environ.get("PPQSFLHE_BENCH_BACKEND", "fourstep"),
        ntt_impl=os.environ.get("PPQSFLHE_BENCH_IMPL", "xla"))


def run_prep(out_path: str) -> None:
    import jax
    import numpy as np

    import ppqsflhe_tpu  # noqa: F401
    from ppqsflhe_tpu.ckks.scheme import CkksScheme
    from ppqsflhe_tpu.fl.api import _encrypt_batch
    from ppqsflhe_tpu.train import gru, lstm

    sch = CkksScheme(_params())
    slots = sch.encoder.slots
    params = lstm.init_params(jax.random.PRNGKey(0), 7)
    n_params = lstm.num_params(params)
    summary = gru.params_to_summary(params)
    vecs = []
    for e in summary:
        vals = np.asarray(e["values"], np.float64)
        vecs += [np.array([e["mean"]]), np.array([e["std_dev"]])]
        for c in range(max(1, -(-vals.size // slots))):
            vecs.append(vals[c * slots : (c + 1) * slots])
    B = len(vecs)
    print(f"[mk-prep] {n_params} params → {B} cts/client × {N_CLIENTS} clients",
          file=sys.stderr)

    k0 = jax.random.PRNGKey(99)
    sks, pks = [], []
    for i in range(N_CLIENTS):
        sk, pk = sch.keygen(jax.random.fold_in(k0, i))
        sks.append(sk)
        pks.append(pk)
    hub = N_CLIENTS - 1
    rk_to_hub, rk_from_hub = [], []
    for i in range(N_CLIENTS - 1):
        rk_to_hub.append(np.asarray(
            sch.rekey_gen(sks[i], pks[hub], jax.random.fold_in(k0, 1000 + i)).data))
        rk_from_hub.append(np.asarray(
            sch.rekey_gen(sks[hub], pks[i], jax.random.fold_in(k0, 2000 + i)).data))
    stacks = []
    for i in range(N_CLIENTS):
        cts = _encrypt_batch(sch, pks[i], vecs, jax.random.fold_in(k0, 3000 + i))
        stacks.append(np.stack([np.asarray(c.data) for c in cts]))
        print(f"[mk-prep] encrypted client {i+1}/{N_CLIENTS}", file=sys.stderr)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez(out_path,
             stacks=np.stack(stacks), rk_to_hub=np.stack(rk_to_hub),
             rk_from_hub=np.stack(rk_from_hub),
             scale=np.float64(float(cts[0].scale)),
             s_hub_int=np.asarray(sks[hub].s_int),
             probe=np.asarray(vecs[2][:8], np.float64),
             n_params=np.int64(n_params))


def run_check(agg_path: str) -> None:
    import jax.numpy as jnp
    import numpy as np

    import ppqsflhe_tpu  # noqa: F401
    from ppqsflhe_tpu.ckks.scheme import CkksScheme
    from ppqsflhe_tpu.ckks.types import Ciphertext, SecretKey
    from ppqsflhe_tpu.core import sampling

    sch = CkksScheme(_params())
    z = np.load(CACHE)
    a = np.load(agg_path)
    s_int = z["s_hub_int"]
    coeff = sampling.signed_to_rns(jnp.asarray(s_int, jnp.int32), sch.ctx.moduli_qp)
    sk = SecretKey(s_eval=sch.ctx.ntt(coeff, tuple(range(len(sch.ctx.moduli_qp)))),
                   s_int=s_int)
    got = sch.decrypt(sk, Ciphertext(jnp.asarray(a["agg2"]),
                                     scale=float(a["out_scale"])), num=8)
    print(json.dumps({"err": float(np.abs(np.asarray(got) - z["probe"][:8]).max())}))


def main() -> None:
    if "--prep" in sys.argv:
        run_prep(sys.argv[sys.argv.index("--prep") + 1])
        return
    if "--check" in sys.argv:
        run_check(sys.argv[sys.argv.index("--check") + 1])
        return

    # CPU subprocesses must not inherit a TPU-only ntt impl (no Mosaic on CPU)
    cpu_env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
                   PPQSFLHE_BENCH_IMPL="xla")
    if not os.path.exists(CACHE):
        print("[mk] prepping in CPU subprocess (cached afterwards)…", file=sys.stderr)
        t0 = time.time()
        r = subprocess.run([sys.executable, __file__, "--prep", CACHE], env=cpu_env)
        if r.returncode != 0:
            raise SystemExit("prep failed")
        print(f"[mk] prep done in {time.time()-t0:.1f}s", file=sys.stderr)

    import jax
    import jax.numpy as jnp
    import numpy as np

    import ppqsflhe_tpu  # noqa: F401
    from ppqsflhe_tpu.ckks import eval as ev
    from ppqsflhe_tpu.ckks.scheme import CkksScheme
    from ppqsflhe_tpu.ckks.types import KeySwitchKey
    from ppqsflhe_tpu.core.modarith import modadd

    accel = jax.devices()[0]
    print(f"[mk] device: {accel}", file=sys.stderr)
    sch = CkksScheme(_params())
    z = np.load(CACHE)
    scale = float(z["scale"])
    C = int(z["stacks"].shape[0])
    B = int(z["stacks"].shape[1])
    L = int(z["stacks"].shape[3])

    # Lazy level management (bench.py mode 4, the measured-best schedule —
    # docs/PERF.md): LevelReduce one limb on entry (inbound switches at
    # l=2), free ÷C for power-of-two client counts (1/C encoded at scale C
    # is the constant 1 — pure scale metadata), then LevelReduce again so
    # the C−1 outbound switches run at l=1.
    lazy = int(os.environ.get("PPQSFLHE_BENCH_LAZY", "4") or 0)
    free_div = lazy >= 2 and (C & (C - 1)) == 0
    l_in = max(1, L - 1) if lazy else L
    out_scale = scale * C if free_div else scale

    host_stacks = np.ascontiguousarray(z["stacks"][:, :, :, :l_in])
    gb = host_stacks.nbytes / 1e9

    t0 = time.time()
    from ppqsflhe_tpu.ckks.types import KeySwitchKey as _KSK

    # stage + convert the long-lived rekeys to Montgomery form (halves the
    # per-ct inner-product multiplies, ev.ksk_to_mont)
    rk_to = ev.ksk_to_mont(sch.ctx, _KSK(
        data=jax.device_put(jnp.asarray(z["rk_to_hub"]), accel))).data
    rk_from = ev.ksk_to_mont(sch.ctx, _KSK(
        data=jax.device_put(jnp.asarray(z["rk_from_hub"]), accel))).data
    stacks_dev = jax.device_put(jnp.asarray(host_stacks), accel)    # (C, B, 2, l, N)
    np.asarray(stacks_dev[0, 0, 0, 0, :1])       # force the transfers
    t_stage = time.time() - t0
    print(f"[mk] staged {gb:.2f} GB cts + rekeys to HBM in {t_stage:.1f}s "
          f"({gb/max(t_stage,1e-9):.3f} GB/s tunnel)", file=sys.stderr)

    def re_enc(d_stack, rk, l):
        """(B, 2, l, N) PRE under one rekey — vmapped keyswitch."""
        q, _, _ = sch.ctx.limb_consts(sch.ctx.q_idx(l))

        def one(d):
            d0, d1 = ev.keyswitch(sch.ctx, d[1],
                                  KeySwitchKey(data=rk, mont=True), l)
            return jnp.stack([modadd(d[0], d0, q), d1])

        return jax.vmap(one)(d_stack)

    def server_round(stacks, k_to, k_from):
        """The full C-client round: scan over clients (ONE keyswitch body
        per direction compiles, not C−1)."""
        q, _, _ = sch.ctx.limb_consts(sch.ctx.q_idx(l_in))
        hub = stacks[C - 1]

        def body_in(acc, xs):
            d, rk = xs
            return jax.vmap(lambda a, b: modadd(a, b, q))(
                acc, re_enc(d, rk, l_in)), None

        acc, _ = jax.lax.scan(body_in, hub, (stacks[: C - 1], k_to))
        if free_div:
            avg = acc                          # ÷C is scale metadata
        else:
            import functools

            from ppqsflhe_tpu.ckks.types import Ciphertext

            avg = jax.vmap(lambda a: ev.mult_scalar(
                sch.ctx, Ciphertext(a, scale), 1.0 / C).data)(acc)
        if lazy >= 4 and avg.shape[-2] > 1:
            avg = avg[..., :-1, :]             # free LevelReduce → l=1
        l_out = avg.shape[-2]

        def body_out(_, rk):
            return None, re_enc(avg, rk, l_out)

        _, outs = jax.lax.scan(body_out, None, k_from)
        return avg, outs                       # (B,2,l',N), (C-1,B,2,l',N)

    # one real round for the correctness artifact
    jr = jax.jit(server_round)
    t0 = time.time()
    agg, outs = jr(stacks_dev, rk_to, rk_from)
    np.asarray(agg[0, 0, 0, :1])
    print(f"[mk] round compile+first: {time.time()-t0:.1f}s", file=sys.stderr)

    # honest on-chip rounds/sec: chain R rounds with a carry perturbation +
    # checksum (see module doc)
    def rounds(R):
        def run(stacks, k_to, k_from):
            def body(c, _):
                s = stacks.at[0, 0, 0, 0, 0].set(
                    (stacks[0, 0, 0, 0, 0] >> jnp.uint64(1)) + (c & jnp.uint64(1)))
                a, o = server_round(s, k_to, k_from)
                chk = (a.astype(jnp.uint32).sum() +
                       o.astype(jnp.uint32).sum()).astype(jnp.uint64)
                return chk, None
            c, _ = jax.lax.scan(body, jnp.uint64(0), None, length=R)
            return c
        return jax.jit(run)

    def timed(R, reps=2):
        jf = rounds(R)
        np.asarray(jf(stacks_dev, rk_to, rk_from))
        best = None
        for _ in range(reps):
            t0 = time.time()
            np.asarray(jf(stacks_dev, rk_to, rk_from))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return best

    t1, t3 = timed(1), timed(3)
    sec = (t3 - t1) / 2
    print(f"[mk] call(R=1)={t1:.2f}s call(R=3)={t3:.2f}s -> on-chip "
          f"{sec:.3f}s/round", file=sys.stderr)

    # optional: streaming schedule (fresh cts per round, H2D overlapped
    # with compute client-by-client — what a per-round deployment pays)
    stream_sec = None
    if os.environ.get("PPQSFLHE_MK_STREAM"):
        j_re = jax.jit(lambda d, rk: re_enc(d, rk, l_in))
        j_add = jax.jit(jax.vmap(lambda a, b: modadd(
            a, b, sch.ctx.limb_consts(sch.ctx.q_idx(l_in))[0])))
        t0 = time.time()
        acc = jax.device_put(jnp.asarray(host_stacks[C - 1]), accel)
        nxt = jax.device_put(jnp.asarray(host_stacks[0]), accel)
        for i in range(C - 1):
            d = nxt
            if i + 1 < C - 1:   # issue next H2D before computing (async)
                nxt = jax.device_put(jnp.asarray(host_stacks[i + 1]), accel)
            acc = j_add(acc, j_re(d, rk_to[i]))
        avg = acc[..., :-1, :] if lazy >= 4 else acc
        l_out = avg.shape[-2]
        j_out = jax.jit(lambda a, rk: re_enc(a, rk, l_out))
        outs2 = [j_out(avg, rk_from[i]) for i in range(C - 1)]
        np.asarray(outs2[-1][0, 0, 0, :1])
        stream_sec = time.time() - t0
        print(f"[mk] streaming round (fresh cts, H2D overlapped): "
              f"{stream_sec:.1f}s", file=sys.stderr)

    # correctness from THIS run
    import tempfile

    tmp = tempfile.mkdtemp(prefix="mk_")
    agg_path = os.path.join(tmp, "agg.npz")
    np.savez(agg_path, agg2=np.asarray(agg[2]), out_scale=np.float64(out_scale))
    r = subprocess.run([sys.executable, __file__, "--check", agg_path],
                       env=cpu_env, capture_output=True, text=True)
    err = float("inf")
    if r.returncode == 0 and r.stdout.strip():
        err = json.loads(r.stdout.strip().splitlines()[-1])["err"]
    else:
        print(f"[mk] check subprocess failed (rc={r.returncode}):\n"
              f"{(r.stderr or '')[-1500:]}", file=sys.stderr)
    ok = err < 1e-3
    print(f"[mk] correct={ok} err={err:.2e}", file=sys.stderr)

    out = {
        "metric": "multikey_fl_rounds_per_sec",
        "value": round(1.0 / sec, 3),
        "unit": "rounds/s",
        "clients": C,
        "params": int(z["n_params"]),
        "round_seconds": round(sec, 3),
        "staging_seconds": round(t_stage, 1),
        "correct": ok,
        "err": err,
    }
    if stream_sec is not None:
        out["stream_round_seconds"] = round(stream_sec, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
