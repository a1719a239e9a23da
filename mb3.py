import time, numpy as np, jax, jax.numpy as jnp

def bench(fn, *args, reps=3, name=""):
    t0=time.time(); r = np.asarray(fn(*args)); c=time.time()-t0
    ts=[]
    for _ in range(reps):
        t0=time.time(); r = np.asarray(fn(*args)); ts.append(time.time()-t0)
    print(f"{name}: best={min(ts)*1000:.1f}ms compile+first={c:.1f}s", flush=True)
    return min(ts)

rng = np.random.default_rng(0)
N = 1 << 22
a = jnp.asarray(rng.integers(0, 1<<16, size=(N,), dtype=np.uint32))
b = jnp.asarray(rng.integers(0, 1<<16, size=(N,), dtype=np.uint32))

def chain(k, expr):
    @jax.jit
    def f(a, b):
        x = a
        for i in range(k):
            x = expr(x, b, i)
        return jnp.sum(x, dtype=jnp.uint32)
    return f

u32op = lambda x, b, i: (x * b + np.uint32(i)) & np.uint32(0xffff)
t1 = bench(chain(100, u32op), a, b, name="100x u32(mul+add+and) N=4M")
t2 = bench(chain(800, u32op), a, b, name="800x u32(mul+add+and) N=4M")
gops = 700*3*N/(t2-t1)/1e9
print(f"  -> u32 {gops:.0f} G elem-ops/s ({700*N/(t2-t1)/1e9:.1f} G muls/s)")

addop = lambda x, b, i: (x + b) & np.uint32(0xffff)
t1 = bench(chain(100, addop), a, b, name="100x u32(add+and) N=4M")
t2 = bench(chain(800, addop), a, b, name="800x u32(add+and) N=4M")
print(f"  -> u32 add+and {700*2*N/(t2-t1)/1e9:.0f} G elem-ops/s")

af = jnp.asarray(rng.random(N, dtype=np.float32))
bf = jnp.asarray((rng.random(N, dtype=np.float32)))
def fchain(k):
    @jax.jit
    def f(a, b):
        x = a
        for i in range(k):
            x = x * b + np.float32(1.0)
        return jnp.sum(x)
    return f
t1 = bench(fchain(100), af, bf, name="100x f32 fma N=4M")
t2 = bench(fchain(800), af, bf, name="800x f32 fma N=4M")
print(f"  -> f32 {700*N/(t2-t1)/1e9:.1f} Gfma/s")
