#!/usr/bin/env python
"""BASELINE.json config 5: full multikey FL round — 16 clients × 1M-param
LSTM weights: PRE every non-hub client into the hub domain, homomorphic
FedAvg, PRE the aggregate back to every client. Reports
encrypted-aggregation rounds/sec on the attached TPU.

The plaintext payload is the stacked-LSTM export (train/lstm.py, 1,091,101
parameters → 138 value + 16 scalar ciphertexts per client at batch 8192).
Prep (16 keygens, 30 rekeys, 2464 encryptions) runs in a CPU subprocess and
is cached under .bench_cache/ — the TPU process times only the protocol.

Prints ONE JSON line {"metric", "value", "unit", "clients", "params"}.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

N_CLIENTS = int(os.environ.get("PPQSFLHE_MK_CLIENTS", "16"))
CHUNK = int(os.environ.get("PPQSFLHE_MK_CHUNK", "32"))
CACHE = os.path.join(REPO, ".bench_cache", f"multikey_{N_CLIENTS}.npz")


def _params():
    from ppqsflhe_tpu.ckks.params import CkksParams

    return CkksParams.generate(n=1 << 14, mult_depth=2, scale_bits=40, dnum=2,
                               ntt_backend=os.environ.get("PPQSFLHE_BENCH_BACKEND", "fourstep"))


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


def main() -> None:
    if "--prep" in sys.argv:
        run_prep(sys.argv[sys.argv.index("--prep") + 1])
        return

    if not os.path.exists(CACHE):
        cpu_env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
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
    from ppqsflhe_tpu.ckks.types import Ciphertext, KeySwitchKey
    from ppqsflhe_tpu.core.modarith import modadd

    accel = jax.devices()[0]
    print(f"[mk] device: {accel}", file=sys.stderr)
    sch = CkksScheme(_params())
    z = np.load(CACHE)
    scale = float(z["scale"])
    stacks = z["stacks"]           # (C, B, 2, L, N) — keep on host, feed chunks
    C, B = stacks.shape[:2]
    L = stacks.shape[3]
    q_np = sch.ctx.q_vec[:L]

    def re_enc_chunk(d_chunk, rk):   # (b, 2, L, N)
        def one(d):
            l = d.shape[1]
            q, _, _ = sch.ctx.limb_consts(sch.ctx.q_idx(l))
            d0, d1 = ev.keyswitch(sch.ctx, d[1], KeySwitchKey(data=rk), l)
            return jnp.stack([modadd(d[0], d0, q), d1])
        return jax.vmap(one)(d_chunk)

    def add_chunk(a_chunk, b_chunk):
        return jax.vmap(lambda a, b: ev.add(
            sch.ctx, Ciphertext(a, scale), Ciphertext(b, scale)).data)(a_chunk, b_chunk)

    def avg_chunk(a_chunk):
        return jax.vmap(lambda a: ev.mult_scalar(
            sch.ctx, Ciphertext(a, scale), 1.0 / C).data)(a_chunk)

    j_re = jax.jit(re_enc_chunk)
    j_add = jax.jit(add_chunk)
    j_avg = jax.jit(avg_chunk)

    rk_to = [jax.device_put(jnp.asarray(z["rk_to_hub"][i]), accel) for i in range(C - 1)]
    rk_from = [jax.device_put(jnp.asarray(z["rk_from_hub"][i]), accel) for i in range(C - 1)]

    nchunks = -(-B // CHUNK)
    pad = nchunks * CHUNK - B
    host_stacks = np.pad(stacks, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0)))

    # Lazy level management (bench.py mode 4, the measured-best schedule —
    # docs/PERF.md): LevelReduce one limb on entry (inbound switches at
    # l=2), free ÷C for power-of-two client counts (1/C encoded at scale C
    # is the constant 1 — pure scale metadata), then LevelReduce again so
    # the C−1 outbound switches run at l=1. PPQSFLHE_BENCH_LAZY=0 restores
    # the reference's full-level schedule.
    lazy = int(os.environ.get("PPQSFLHE_BENCH_LAZY", "4") or 0)
    free_div = lazy >= 2 and (C & (C - 1)) == 0
    if lazy:
        host_stacks = host_stacks[:, :, :, : max(1, L - 1)]
    out_scale = scale * C if free_div else scale

    def full_round():
        outs = []
        agg_chunks = []
        for c in range(nchunks):
            sl = slice(c * CHUNK, (c + 1) * CHUNK)
            acc = jax.device_put(jnp.asarray(host_stacks[C - 1, sl]), accel)
            for i in range(C - 1):
                d = jax.device_put(jnp.asarray(host_stacks[i, sl]), accel)
                acc = j_add(acc, j_re(d, rk_to[i]))
            avg = acc if free_div else j_avg(acc)
            if lazy >= 4 and avg.shape[2] > 1:
                avg = avg[:, :, :-1]    # free LevelReduce before the return PREs
            agg_chunks.append(avg)
            outs.append([j_re(avg, rk_from[i]) for i in range(C - 1)])
        jax.block_until_ready(outs)
        return agg_chunks, outs

    t0 = time.time()
    agg_chunks, _ = full_round()
    print(f"[mk] compile+first round: {time.time()-t0:.1f}s", file=sys.stderr)
    times = []
    for _ in range(2):
        t0 = time.time()
        agg_chunks, _ = full_round()
        times.append(time.time() - t0)
    sec = float(np.median(times))

    # correctness: decrypt one aggregate ct in the hub domain (CPU subprocess)
    import tempfile

    tmp = tempfile.mkdtemp(prefix="mk_")
    np.savez(os.path.join(tmp, "agg.npz"), agg2=np.asarray(agg_chunks[0][2]),
             out_scale=np.float64(out_scale))
    check = f"""
import json, numpy as np, jax.numpy as jnp, sys
sys.path.insert(0, {REPO!r})
import ppqsflhe_tpu
from ppqsflhe_tpu.ckks.scheme import CkksScheme
from ppqsflhe_tpu.ckks.types import Ciphertext, SecretKey
from ppqsflhe_tpu.core import sampling
sys.argv = []
exec(open({__file__!r}).read().split('def main')[0])
sch = CkksScheme(_params())
z = np.load({CACHE!r}); a = np.load({os.path.join(tmp, 'agg.npz')!r})
s_int = z['s_hub_int']
coeff = sampling.signed_to_rns(jnp.asarray(s_int, jnp.int32), sch.ctx.moduli_qp)
sk = SecretKey(s_eval=sch.ctx.ntt(coeff, tuple(range(len(sch.ctx.moduli_qp)))), s_int=s_int)
sc = float(a['out_scale']) if 'out_scale' in a else float(z['scale'])
got = sch.decrypt(sk, Ciphertext(jnp.asarray(a['agg2']), scale=sc), num=8)
print(json.dumps({{"err": float(np.abs(np.asarray(got) - z['probe'][:8]).max())}}))
"""
    cpu_env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    r = subprocess.run([sys.executable, "-c", check], env=cpu_env,
                       capture_output=True, text=True)
    err = float("inf")
    if r.returncode == 0 and r.stdout.strip():
        err = json.loads(r.stdout.strip().splitlines()[-1])["err"]
    else:
        print(f"[mk] check subprocess failed (rc={r.returncode}):\n"
              f"{(r.stderr or '')[-1500:]}", file=sys.stderr)
    print(f"[mk] round times={['%.2f' % t for t in times]} err={err:.2e}", file=sys.stderr)

    print(json.dumps({
        "metric": "multikey_fl_rounds_per_sec",
        "value": round(1.0 / sec, 3),
        "unit": "rounds/s",
        "clients": C,
        "params": int(z["n_params"]),
        "round_seconds": round(sec, 2),
        "err": err,
    }))


if __name__ == "__main__":
    main()
