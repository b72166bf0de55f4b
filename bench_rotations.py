#!/usr/bin/env python
"""Galois-rotation / hoisted-keyswitch benchmark at N=2^15 (BASELINE.json
north-star config 3: "Galois rotations + hoisted key-switching for packed
weight-vector inner products, N=2^15").

Measures, on the attached TPU, R=8 slot rotations of one ciphertext:

  plain    — R independent EvalRotate calls (R full key switches)
  hoisted  — ONE decompose+extend (keyswitch_core) shared by all R
             rotations (eval.rotate_hoisted)

A rotation is an eval-domain bin permutation (zero NTTs on the ct itself),
so the key switch IS the cost and hoisting removes the per-rotation
decompose+extend — the classic amortization for packed inner products
(scheme.inner_product's rotate-and-add tree).

Prep (keys, rotation keys, one encrypted vector) runs in a CPU subprocess
and is cached in .bench_cache/ (same process split as bench.py: the axon
PJRT plugin deadlocks dual-platform CPU compiles). Prints one JSON line.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

N = 1 << 15
ROTS = [1, 2, 4, 8, 16, 32, 64, 128]


def _params():
    from ppqsflhe_tpu.ckks.params import CkksParams

    return CkksParams.generate(
        n=N, mult_depth=2, scale_bits=40, dnum=2, ntt_backend="fourstep",
        ntt_impl=os.environ.get("PPQSFLHE_BENCH_IMPL", "xla"))


def run_prep(out_path: str) -> None:
    import jax
    import numpy as np

    import ppqsflhe_tpu  # noqa: F401
    from ppqsflhe_tpu.ckks.scheme import CkksScheme

    sch = CkksScheme(_params())
    k = jax.random.PRNGKey(3)
    sk, pk = sch.keygen(jax.random.fold_in(k, 1))
    rot_keys = sch.rotation_key_gen(sk, ROTS, jax.random.fold_in(k, 2))
    v = np.linspace(-1, 1, sch.encoder.slots)
    ct = sch.encrypt_values(pk, v, jax.random.fold_in(k, 3))
    np.savez(out_path,
             ct=np.asarray(ct.data), scale=np.float64(ct.scale),
             s_int=np.asarray(sk.s_int),
             **{f"rk{r}": np.asarray(rot_keys[r].data) for r in ROTS})


def run_check(prep_path: str, out_path: str) -> None:
    import jax.numpy as jnp
    import numpy as np

    import ppqsflhe_tpu  # noqa: F401
    from ppqsflhe_tpu.ckks.scheme import CkksScheme
    from ppqsflhe_tpu.ckks.types import Ciphertext, SecretKey
    from ppqsflhe_tpu.core import sampling

    sch = CkksScheme(_params())
    z, o = np.load(prep_path), np.load(out_path)
    all_idx = tuple(range(len(sch.ctx.moduli_qp)))
    coeff = sampling.signed_to_rns(jnp.asarray(z["s_int"], jnp.int32),
                                   sch.ctx.moduli_qp)
    sk = SecretKey(s_eval=sch.ctx.ntt(coeff, all_idx), s_int=z["s_int"])
    v = np.linspace(-1, 1, sch.encoder.slots)
    errs = []
    for i, r in enumerate(ROTS):
        got = sch.decrypt(sk, Ciphertext(jnp.asarray(o["outs"][i]),
                                         scale=float(z["scale"])), num=64)
        errs.append(float(np.abs(np.asarray(got) -
                                 np.roll(v, -r)[:64]).max()))
    print(json.dumps({"err": max(errs)}))


def run_check_sum(prep_path: str, out_path: str) -> None:
    import jax.numpy as jnp
    import numpy as np

    import ppqsflhe_tpu  # noqa: F401
    from ppqsflhe_tpu.ckks.scheme import CkksScheme
    from ppqsflhe_tpu.ckks.types import Ciphertext, SecretKey
    from ppqsflhe_tpu.core import sampling

    sch = CkksScheme(_params())
    z, o = np.load(prep_path), np.load(out_path)
    all_idx = tuple(range(len(sch.ctx.moduli_qp)))
    coeff = sampling.signed_to_rns(jnp.asarray(z["s_int"], jnp.int32),
                                   sch.ctx.moduli_qp)
    sk = SecretKey(s_eval=sch.ctx.ntt(coeff, all_idx), s_int=z["s_int"])
    v = np.linspace(-1, 1, sch.encoder.slots)
    want = sum(np.roll(v, -r) for r in ROTS)
    got = sch.decrypt(sk, Ciphertext(jnp.asarray(o["outs"][0]),
                                     scale=float(z["scale"])), num=64)
    err = float(np.abs(np.asarray(got) - want[:64]).max())
    print(json.dumps({"err": err}))


def main() -> None:
    if "--prep" in sys.argv:
        run_prep(sys.argv[sys.argv.index("--prep") + 1])
        return
    if "--check" in sys.argv:
        i = sys.argv.index("--check")
        run_check(sys.argv[i + 1], sys.argv[i + 2])
        return
    if "--check-sum" in sys.argv:
        i = sys.argv.index("--check-sum")
        run_check_sum(sys.argv[i + 1], sys.argv[i + 2])
        return

    import tempfile

    cpu_env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
                   PPQSFLHE_BENCH_IMPL="xla")
    prep_path = os.path.join(REPO, ".bench_cache", f"rot_{N}.npz")
    os.makedirs(os.path.dirname(prep_path), exist_ok=True)
    if not os.path.exists(prep_path):
        print("[bench_rot] prepping in CPU subprocess…", file=sys.stderr)
        r = subprocess.run([sys.executable, __file__, "--prep", prep_path],
                           env=cpu_env, capture_output=True, text=True)
        if r.returncode != 0:
            if os.path.exists(prep_path):
                os.remove(prep_path)
            print(r.stderr[-2000:], file=sys.stderr)
            raise SystemExit("prep failed")

    import jax
    import jax.numpy as jnp
    import numpy as np

    import ppqsflhe_tpu  # noqa: F401
    from ppqsflhe_tpu.ckks import eval as ev
    from ppqsflhe_tpu.ckks.scheme import CkksScheme
    from ppqsflhe_tpu.ckks.types import Ciphertext, KeySwitchKey

    accel = jax.devices()[0]
    print(f"[bench_rot] device: {accel}", file=sys.stderr)
    sch = CkksScheme(_params())
    z = np.load(prep_path)
    scale = float(z["scale"])
    ct = jax.device_put(jnp.asarray(z["ct"]), accel)
    # long-lived rotation keys → Montgomery form (ev.ksk_to_mont)
    rks = [ev.ksk_to_mont(sch.ctx, KeySwitchKey(
        data=jax.device_put(jnp.asarray(z[f"rk{r}"]), accel))).data
        for r in ROTS]

    def plain(ctd, *rkd):
        outs = []
        for r, k in zip(ROTS, rkd):
            o = ev.rotate(sch.ctx, Ciphertext(ctd, scale), r,
                          KeySwitchKey(data=k, mont=True))
            outs.append(o.data)
        return jnp.stack(outs)

    def hoisted(ctd, *rkd):
        keys = {r: KeySwitchKey(data=k, mont=True) for r, k in zip(ROTS, rkd)}
        outs = ev.rotate_hoisted(sch.ctx, Ciphertext(ctd, scale), ROTS, keys)
        return jnp.stack([o.data for o in outs])

    def rot_sum(ctd, *rkd):
        keys = {r: KeySwitchKey(data=k, mont=True) for r, k in zip(ROTS, rkd)}
        return ev.rotate_sum_hoisted(sch.ctx, Ciphertext(ctd, scale), ROTS,
                                     keys).data

    # honest timing (docs/PERF.md): chain R repetitions inside one jit with
    # a carry perturbation + checksum, sync via host fetch, report the
    # marginal between two scan lengths.
    def scan_fn(fn, R):
        def run(ctd, *rkd):
            def body(c, _):
                d = ctd.at[0, 0, 0].set(
                    (ctd[0, 0, 0] >> jnp.uint64(1)) + (c & jnp.uint64(1)))
                o = fn(d, *rkd)
                return o.astype(jnp.uint32).sum().astype(jnp.uint64), None
            c, _ = jax.lax.scan(body, jnp.uint64(0), None, length=R)
            return c
        return jax.jit(run)

    results = {}
    outs_h = outs_p = outs_s = None
    for name, fn in (("plain", plain), ("hoisted", hoisted),
                     ("rot_sum", rot_sum)):
        t0 = time.time()
        out = np.asarray(jax.jit(fn)(ct, *rks))
        print(f"[bench_rot] {name} compile+first: {time.time()-t0:.1f}s",
              file=sys.stderr)

        def timed(jf):
            np.asarray(jf(ct, *rks))
            best = None
            for _ in range(3):
                t0 = time.time()
                np.asarray(jf(ct, *rks))
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            return best

        # large-R anchors (r5 methodology, docs/PERF.md): both calls
        # compute-dominated (a plain 8-rotation round is ~5 ms)
        t_lo, t_hi = timed(scan_fn(fn, 12)), timed(scan_fn(fn, 36))
        results[name] = (t_hi - t_lo) / 24 * 1e6 / len(ROTS)  # µs/rotation
        print(f"[bench_rot] {name}: {results[name]:.0f} µs/rotation on-chip "
              f"({len(ROTS)} rotations)", file=sys.stderr)
        if name == "hoisted":
            outs_h = out
        elif name == "rot_sum":
            outs_s = out
        else:
            outs_p = out

    # the timed plain path must agree bit-exactly with the hoisted one
    # (automorphism commutes with decompose/extend), so the CPU decrypt
    # check below covers BOTH paths — a regression in ev.rotate can't
    # slip through unverified (ADVICE r2).
    plain_matches = bool(np.array_equal(outs_p, outs_h))
    print(f"[bench_rot] plain outputs bit-equal to hoisted: {plain_matches}",
          file=sys.stderr)
    # rotate_sum (double hoisting: ONE deferred ModDown for the whole sum)
    # is checked against the modular sum of the hoisted outputs — the
    # deferred ModDown sees the summed extended-basis value, so residues
    # differ from sum-of-ModDowns by the per-rotation rounding; require
    # slot-level agreement instead (decrypt check below covers it).

    tmp = tempfile.mkdtemp(prefix="ppqsflhe_rot_")
    out_path = os.path.join(tmp, "outs.npz")
    np.savez(out_path, outs=outs_h)
    r = subprocess.run([sys.executable, __file__, "--check", prep_path, out_path],
                       env=cpu_env, capture_output=True, text=True)
    err = (json.loads(r.stdout.strip().splitlines()[-1])["err"]
           if r.returncode == 0 else float("inf"))
    print(f"[bench_rot] hoisted outputs correct={err < 1e-3} err={err:.2e}",
          file=sys.stderr)

    # decrypt-check the rotation SUM on CPU
    err_s = float("inf")
    try:
        import jax.numpy as _jnp

        sum_path = os.path.join(tmp, "outs_sum.npz")
        np.savez(sum_path, outs=outs_s[None])
        rs = subprocess.run([sys.executable, __file__, "--check-sum",
                             prep_path, sum_path],
                            env=cpu_env, capture_output=True, text=True)
        if rs.returncode == 0:
            err_s = json.loads(rs.stdout.strip().splitlines()[-1])["err"]
    except Exception as e:
        print(f"[bench_rot] sum check failed: {e}", file=sys.stderr)
    print(f"[bench_rot] rotate_sum correct={err_s < 1e-2} err={err_s:.2e}",
          file=sys.stderr)

    print(json.dumps({
        "metric": "hoisted_rotation_us_per_rotation_n32768",
        "value": round(results["hoisted"], 1),
        "unit": "us",
        "plain_us": round(results["plain"], 1),
        "hoisting_speedup": round(results["plain"] / results["hoisted"], 2),
        "rot_sum_us": round(results["rot_sum"], 1),
        "rot_sum_speedup": round(results["plain"] / results["rot_sum"], 2),
        "correct": bool(err < 1e-3) and plain_matches and bool(err_s < 1e-2),
        "err": err,
    }))


if __name__ == "__main__":
    main()
