import time, numpy as np, jax, jax.numpy as jnp
from zprize_wasm_msm_tpu.models.curves import bls12_381
from zprize_wasm_msm_tpu.ops.field import mont
from zprize_wasm_msm_tpu.ops.curve import group

def bench(fn, *args, reps=3, name="", work=1):
    t0=time.time(); r = np.asarray(fn(*args)); c=time.time()-t0
    ts=[]
    for _ in range(reps):
        t0=time.time(); r = np.asarray(fn(*args)); ts.append(time.time()-t0)
    t=min(ts)
    print(f"{name}: best={t*1000:.1f}ms compile+first={c:.1f}s -> {work/t/1e6:.1f} M/s", flush=True)
    return t

fq = bls12_381.fq
rng = np.random.default_rng(0)
N = 1 << 19
a = jnp.asarray(rng.integers(0, 1<<15, size=(fq.n_limbs, N), dtype=np.uint32))
b = jnp.asarray(rng.integers(0, 1<<15, size=(fq.n_limbs, N), dtype=np.uint32))

def mulchain(k):
    @jax.jit
    def f(a, b):
        x = a
        for _ in range(k):
            x = mont.mont_mul(fq, x, b)
        return jnp.sum(x[0], dtype=jnp.uint32)
    return f
t1 = bench(mulchain(2), a, b, name="2x mont_mul N=512k", work=2*N)
t2 = bench(mulchain(10), a, b, name="10x mont_mul N=512k", work=10*N)
print(f"  -> marginal {8*N/(t2-t1)/1e6:.1f} M field-muls/s")

P = group.generator(bls12_381, (N//4,))
def addchain(k):
    @jax.jit
    def f(p):
        x = p
        for _ in range(k):
            x = group.add(bls12_381, x, p)
        return jnp.sum(x[0][0], dtype=jnp.uint32)
    return f
t1 = bench(addchain(1), P, name="1x group.add N=128k", work=N//4)
t2 = bench(addchain(5), P, name="5x group.add N=128k", work=5*(N//4))
print(f"  -> marginal {4*(N//4)/(t2-t1)/1e6:.2f} M group-adds/s")
