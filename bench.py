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

Only the timed server round runs on the TPU; key generation, encryption and
the correctness decrypt run on the in-process CPU backend so the TPU pays
exactly one (persistently cached) compile.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "axon,cpu" if os.environ.get("JAX_PLATFORMS", "axon") != "cpu" else "cpu"
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_SERVER_CRYPTO_MS = 8000.0


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import ppqsflhe_tpu  # noqa: F401  (enables x64 + compile cache)
    from ppqsflhe_tpu.ckks import eval as ev
    from ppqsflhe_tpu.ckks.params import CkksParams
    from ppqsflhe_tpu.ckks.scheme import CkksScheme
    from ppqsflhe_tpu.ckks.types import Ciphertext

    cpu = jax.devices("cpu")[0]
    accel = jax.devices()[0]
    print(f"[bench] timed device: {accel}; prep device: {cpu}", file=sys.stderr)

    params = CkksParams.generate(n=1 << 14, mult_depth=2, scale_bits=40, dnum=2)
    sch = CkksScheme(params)

    # Reference workload: the real GRU weight payload if mounted, else synthetic
    ref_w = "/root/reference/client/storage/client_1/private/sample_weights_c1.json"
    rng = np.random.default_rng(0)
    if os.path.exists(ref_w):
        with open(ref_w) as f:
            entries = json.load(f)["weights_summary"]
        vecs = []
        for e in entries:
            vals = np.asarray(e["values"], np.float64)
            vecs += [np.array([e["mean"]]), np.array([e["std_dev"]])]
            b = sch.encoder.slots
            for c in range(max(1, -(-vals.size // b))):
                vecs.append(vals[c * b : (c + 1) * b])
    else:
        vecs = [rng.uniform(-1, 1, sch.encoder.slots) for _ in range(27)]
    B = len(vecs)
    print(f"[bench] payload: {B} ciphertexts per client", file=sys.stderr)

    from ppqsflhe_tpu.fl.api import _encrypt_batch

    t0 = time.time()
    with jax.default_device(cpu):
        k0 = jax.random.PRNGKey(7)
        sk1, pk1 = sch.keygen(jax.random.fold_in(k0, 1))
        sk2, pk2 = sch.keygen(jax.random.fold_in(k0, 2))
        rk_1to2 = sch.rekey_gen(sk1, pk2, jax.random.fold_in(k0, 3))
        rk_2to1 = sch.rekey_gen(sk2, pk1, jax.random.fold_in(k0, 4))
        cts1 = _encrypt_batch(sch, pk1, vecs, jax.random.fold_in(k0, 5))
        cts2 = _encrypt_batch(sch, pk2, vecs, jax.random.fold_in(k0, 6))
        jax.block_until_ready(rk_2to1.data)
    print(f"[bench] cpu prep (keys+rekeys+encrypt 2x{B}): {time.time()-t0:.1f}s",
          file=sys.stderr)

    scale = cts1[0].scale
    put = lambda x: jax.device_put(jnp.asarray(x), accel)
    stack1 = put(np.stack([np.asarray(c.data) for c in cts1]))
    stack2 = put(np.stack([np.asarray(c.data) for c in cts2]))
    rk12 = put(np.asarray(rk_1to2.data))
    rk21 = put(np.asarray(rk_2to1.data))

    def server_round(s1, s2, k12, k21):
        """PRE(c1→2) + FedAvg + PRE(agg→1), batched over all B cts."""
        from ppqsflhe_tpu.core.modarith import modadd

        def re_enc(d, rk):
            from ppqsflhe_tpu.ckks.types import KeySwitchKey

            l = d.shape[1]
            q, _, _ = sch.ctx.limb_consts(sch.ctx.q_idx(l))
            d0, d1 = ev.keyswitch(sch.ctx, d[1], KeySwitchKey(data=rk), l)
            return jnp.stack([modadd(d[0], d0, q), d1])

        def agg_pair(d1, d2):
            c1in2 = re_enc(d1, k12)
            s = ev.add(sch.ctx, Ciphertext(c1in2, scale), Ciphertext(d2, scale))
            avg = ev.mult_scalar(sch.ctx, s, 0.5)
            back = re_enc(avg.data, k21)
            return avg.data, back

        return jax.vmap(agg_pair)(s1, s2)

    fn = jax.jit(server_round)
    t0 = time.time()
    agg, agg_in1 = fn(stack1, stack2, rk12, rk21)
    jax.block_until_ready((agg, agg_in1))
    print(f"[bench] server round compile+first run: {time.time()-t0:.1f}s", file=sys.stderr)

    times = []
    for _ in range(3):
        t0 = time.time()
        agg, agg_in1 = fn(stack1, stack2, rk12, rk21)
        jax.block_until_ready((agg, agg_in1))
        times.append(time.time() - t0)
    ms = float(np.median(times) * 1e3)

    # correctness: decrypt one aggregate ciphertext on CPU ≈ mean of inputs
    with jax.default_device(cpu):
        got = sch.decrypt(sk2, Ciphertext(jax.device_put(agg[2], cpu), scale), num=16)
    want = vecs[2][:16]  # both clients encrypted identical payloads → mean == input
    err = float(np.abs(np.asarray(got) - want[: len(got)]).max())
    ok = err < 1e-3
    print(f"[bench] times={['%.3f' % t for t in times]} correct={ok} err={err:.2e}",
          file=sys.stderr)

    print(json.dumps({
        "metric": "server_encrypted_aggregation_latency",
        "value": round(ms, 1),
        "unit": "ms",
        "vs_baseline": round(BASELINE_SERVER_CRYPTO_MS / ms, 2),
    }))


if __name__ == "__main__":
    main()
