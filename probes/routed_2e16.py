"""Default-scope routed pallas_mxu at N=2^16 (mont-twiddle nd=6 group)."""
import os, sys, time
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax, jax.numpy as jnp, numpy as np
from ppqsflhe_tpu.core import primes
from ppqsflhe_tpu.ops.pallas_ntt import FourStepNtt

R_LO, R_HI = 100, 300
dev = jax.devices()[0]
n, L, B = 1 << 16, 4, 8
moduli = [primes.first_prime_down(59, 2 * n)] + primes.prime_chain(40, 3, 2 * n)
moduli = moduli[:L]
psis = [primes.root_of_unity(2 * n, q) for q in moduli]
fs = FourStepNtt(n, moduli, psis)
pm = fs.pallas_mxu()
print("fits: shoup nd=6", pm._group_fits(6, 4), "| mont nd=6",
      pm._group_fits(6, 2), "| mont nd=9", pm._group_fits(9, 2),
      file=sys.stderr)
rng = np.random.default_rng(0)
x = np.stack([np.stack([rng.integers(0, q, n, dtype=np.uint64) for q in moduli])
              for _ in range(B)])
xd = jax.device_put(jnp.asarray(x), dev)

# correctness on-chip vs xla
want = np.asarray(jax.jit(lambda a: fs.ntt(a, implementation="xla"))(xd))
got = np.asarray(jax.jit(lambda a: fs.ntt(a, implementation="pallas_mxu"))(xd))
assert np.array_equal(got, want), "on-chip mismatch"
print("on-chip bit-exact vs xla OK", file=sys.stderr)

def scan_fn(R):
    def run(a):
        def body(c, _):
            return fs.ntt(c, implementation="pallas_mxu"), None
        out, _ = jax.lax.scan(body, a, None, length=R)
        return out, out.astype(jnp.uint32).sum()
    return jax.jit(run)

jf_lo, jf_hi = scan_fn(R_LO), scan_fn(R_HI)
t0 = time.time(); np.asarray(jf_lo(xd)[1]); print(f"compile lo {time.time()-t0:.1f}s", file=sys.stderr)
t0 = time.time(); np.asarray(jf_hi(xd)[1]); print(f"compile hi {time.time()-t0:.1f}s", file=sys.stderr)

def timed(jf):
    best = None
    for _ in range(4):
        t0 = time.time(); np.asarray(jf(xd)[1]); dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best

t_lo, t_hi = timed(jf_lo), timed(jf_hi)
per = (t_hi - t_lo) / (R_HI - R_LO) / (B * L) * 1e6
print(f"N=2^16 L={L} B={B} routed default: {per:.2f} us/limb-NTT "
      f"(t_lo {t_lo*1e3:.0f} ms, t_hi {t_hi*1e3:.0f} ms)")
