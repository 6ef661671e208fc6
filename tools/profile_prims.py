"""Microbench TPU primitive costs: scatter vs sort vs cumsum vs one-hot max.

These numbers pick the implementation strategy for the histogram-like ops
(voxel downsample, SC descriptor, compaction).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

key = jax.random.PRNGKey(0)
print("backend:", jax.default_backend(), flush=True)


def bench(name, fn, *args, n=20):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:<46} {(time.perf_counter()-t0)/n*1e3:8.2f} ms", flush=True)


for N, T in [(8192, 16384), (131072, 1200), (131072, 262144), (614400, 262144)]:
    idx = jax.random.randint(key, (N,), 0, T)
    val = jax.random.uniform(key, (N,))
    val3 = jax.random.uniform(key, (N, 3))
    bench(f"scatter-add   N={N:<7} T={T}",
          lambda i, v: jnp.zeros((T,), jnp.float32).at[i].add(v), idx, val)
    bench(f"scatter-min   N={N:<7} T={T}",
          lambda i, v: jnp.full((T,), 1e9, jnp.float32).at[i].min(v), idx, val)
    bench(f"sort(key,val) N={N}",
          lambda i, v: jax.lax.sort((i, v), num_keys=1), idx, val)
    bench(f"argsort       N={N}", lambda i: jnp.argsort(i), idx)
    bench(f"cumsum        N={N}", lambda v: jnp.cumsum(v), val)

# one-hot chunked max for the SC descriptor shape
N, B = 131072, 1200
bins = jax.random.randint(key, (N,), 0, B)
vals = jax.random.uniform(key, (N,))
def onehot_max(bins, vals, P=512):
    C = N // P
    bc, vc = bins.reshape(C, P), vals.reshape(C, P)
    oh = bc[:, :, None] == jnp.arange(B, dtype=jnp.int32)[None, None, :]
    part = jnp.max(jnp.where(oh, vc[:, :, None], -1e9), axis=1)   # (C,B)
    return part.max(0)
bench("onehot-max    N=131072 B=1200 P=512", onehot_max, bins, vals)
def onehot_max2(bins, vals, P=2048):
    C = N // P
    bc, vc = bins.reshape(C, P), vals.reshape(C, P)
    oh = bc[:, :, None] == jnp.arange(B, dtype=jnp.int32)[None, None, :]
    part = jnp.max(jnp.where(oh, vc[:, :, None], -1e9), axis=1)
    return part.max(0)
bench("onehot-max    N=131072 B=1200 P=2048", onehot_max2, bins, vals)

# segment-sum via sort+cumsum (scatter-free) at downsample shape
N, T = 8192, 16384
idx = jax.random.randint(key, (N,), 0, T)
val3 = jax.random.uniform(key, (N, 3))
def sortcumsum(idx, val3):
    k, x, y, z = jax.lax.sort((idx, val3[:, 0], val3[:, 1], val3[:, 2]),
                              num_keys=1)
    cs = jnp.cumsum(jnp.stack([x, y, z], 1), axis=0)
    newg = jnp.concatenate([jnp.array([True]), k[1:] != k[:-1]])
    return cs, newg
bench("sort+cumsum3  N=8192", sortcumsum, idx, val3)
