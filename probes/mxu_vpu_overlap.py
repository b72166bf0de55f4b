"""Does Mosaic co-issue MXU dots with independent VPU work?

Per grid cell: two int8 dots on column halves + two ~100-op u32 chains.
  serial: dot0; vpu(dot0); dot1; vpu(dot1)   (each dot waits on prior vpu)
  inter : dot0; dot1; vpu(dot0); vpu(dot1)   (dot1 independent of vpu0)
If inter ~= max(mxu, vpu) cross-unit overlap is real; ~= mxu+vpu serial.
"""
import os, sys, time
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

m, nd, c = 256, 6, 256
h = c // 2
K = 64
R_LO, R_HI = 50, 250

rng = np.random.default_rng(0)
A = jnp.asarray(rng.integers(-100, 100, (nd * m, nd * m), dtype=np.int8))
X8 = jnp.asarray(rng.integers(0, 100, (K, nd * m, c), dtype=np.int8))
Z = np.int32(0)

def vpu_chain(p):
    x = p.astype(jnp.uint32)
    for i in range(20):
        x = (x * jnp.uint32(2654435761) + jnp.uint32(i)) ^ (x >> 7)
    return x

def make(kind):
    def kernel(x_ref, a_ref, o_ref):
        x = x_ref[0]
        a = a_ref[...]
        x0 = x[:, :h]
        x1 = x[:, h:]
        if kind == "mxu":
            p0 = jnp.dot(a, x0, preferred_element_type=jnp.int32)
            p1 = jnp.dot(a, x1, preferred_element_type=jnp.int32)
            o_ref[0] = jnp.concatenate([p0, p1], 1).astype(jnp.uint32)[:m]
        elif kind == "vpu":
            x32 = x.astype(jnp.int32)
            v0 = vpu_chain(x32[:m, :h])
            v1 = vpu_chain(x32[:m, h:])
            o_ref[0] = jnp.concatenate([v0, v1], 1)
        elif kind == "serial":
            p0 = jnp.dot(a, x0, preferred_element_type=jnp.int32)
            v0 = vpu_chain(p0[:m])
            p1 = jnp.dot(a, x1, preferred_element_type=jnp.int32)
            v1 = vpu_chain(p1[:m])
            o_ref[0] = jnp.concatenate([v0, v1], 1)
        else:  # inter
            p0 = jnp.dot(a, x0, preferred_element_type=jnp.int32)
            p1 = jnp.dot(a, x1, preferred_element_type=jnp.int32)
            v0 = vpu_chain(p0[:m])
            v1 = vpu_chain(p1[:m])
            o_ref[0] = jnp.concatenate([v0, v1], 1)

    f = pl.pallas_call(
        kernel,
        grid=(K,),
        in_specs=[pl.BlockSpec((1, nd * m, c), lambda k: (k, Z, Z),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((nd * m, nd * m), lambda k: (Z, Z),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, m, c), lambda k: (k, Z, Z),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, m, c), jnp.uint32),
    )
    def run(R):
        def body(carry, _):
            xk = X8 ^ carry
            o = f(xk, A)
            return o[0, 0, 0].astype(jnp.int8), None
        out, _ = jax.lax.scan(body, jnp.int8(0), None, length=R)
        return out
    return jax.jit(run, static_argnums=0)

for kind in ("mxu", "vpu", "serial", "inter"):
    jf = make(kind)
    np.asarray(jf(R_LO)); np.asarray(jf(R_HI))
    def timed(R):
        best = None
        for _ in range(3):
            t0 = time.time(); np.asarray(jf(R)); dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return best
    t_lo, t_hi = timed(R_LO), timed(R_HI)
    per = (t_hi - t_lo) / (R_HI - R_LO) / K * 1e6
    print(f"{kind:7s}: {per:8.2f} us/cell")
