import time, os, numpy as np, jax, jax.numpy as jnp
from zprize_wasm_msm_tpu.models.curves import bls12_381
from zprize_wasm_msm_tpu.ops.field import mont
from zprize_wasm_msm_tpu.ops.curve import group
fq = bls12_381.fq
N = 1 << 20
CHAIN = 4
rng = np.random.default_rng(0)
a = jnp.asarray(rng.integers(0, 1<<16, size=(fq.n_limbs, N), dtype=np.uint32))
b = jnp.asarray(rng.integers(0, 1<<16, size=(fq.n_limbs, N), dtype=np.uint32))

@jax.jit
def mulN(a, b):
    x = a
    for _ in range(CHAIN):
        x = mont.mont_mul(fq, x, b)
    return x

t0=time.time(); r = np.asarray(mulN(a,b)); print("mul compile+first", round(time.time()-t0,1))
for _ in range(3):
    t0=time.time(); r = np.asarray(mulN(a,b)); dt=time.time()-t0
    print(f"{CHAIN} muls x {N}: {dt:.4f}s -> {CHAIN*N/dt/1e6:.1f} M field-muls/s")

P = group.generator(bls12_381, (N//8,))
@jax.jit
def add2(p):
    x = group.add(bls12_381, p, p)
    return group.add(bls12_381, x, p)
t0=time.time(); r = add2(P); _ = np.asarray(r[0]); print("add compile+first", round(time.time()-t0,1))
for _ in range(3):
    t0=time.time(); r = add2(P); _ = np.asarray(r[0]); dt=time.time()-t0
    print(f"2 adds x {N//8}: {dt:.4f}s -> {2*(N//8)/dt/1e6:.2f} M group-adds/s")
