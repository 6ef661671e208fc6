"""Binary-search the frontend/extract/submap time sinks on TPU."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_default_matmul_precision", "highest")

from sc_lego_loam_tpu.config import synthetic_config
from sc_lego_loam_tpu.ops import projection, ground, segmentation, compaction, voxel
from sc_lego_loam_tpu.ops import features as F
from sc_lego_loam_tpu.utils import synthetic

cfg = synthetic_config()
lid, seg = cfg.lidar, cfg.seg
print("backend:", jax.default_backend())

scans, valids, poses = synthetic.make_sequence(cfg.lidar, 1, step=0.5, seed=3)
pts = jax.device_put(jnp.asarray(scans[0]))
msk = jax.device_put(jnp.asarray(valids[0]))


def bench(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    print(f"{name:<34} {(time.perf_counter()-t0)/n*1e3:8.2f} ms", flush=True)
    return out


# Cumulative frontend chains (scalar outputs to force compute, avoid DCE).
@jax.jit
def c1(p, m):
    img = projection.project(p, m, lid)
    return img.rng.sum()

@jax.jit
def c2(p, m):
    img = projection.project(p, m, lid)
    g = ground.ground_mask(img, lid, seg)
    return img.rng.sum() + g.sum()

@jax.jit
def c3(p, m):
    img = projection.project(p, m, lid)
    g = ground.ground_mask(img, lid, seg)
    s = segmentation.segment(img, g, lid, seg)
    return s.label.sum()

@jax.jit
def c4(p, m):
    img = projection.project(p, m, lid)
    g = ground.ground_mask(img, lid, seg)
    s = segmentation.segment(img, g, lid, seg)
    cl, ol = compaction.compact(img, s, g, lid, seg)
    return cl.rng.sum() + ol.count.sum()

bench("proj only", c1, pts, msk)
bench("proj+ground", c2, pts, msk)
bench("proj+ground+seg", c3, pts, msk)
bench("proj+ground+seg+compact", c4, pts, msk)

# How many label-propagation rounds does segmentation need?
img = jax.jit(lambda p, m: projection.project(p, m, lid))(pts, msk)
g = jax.jit(lambda im: ground.ground_mask(im, lid, seg))(img)

# Extract decomposition.
s = jax.jit(lambda im, gg: segmentation.segment(im, gg, lid, seg))(img, g)
cloud, outl = jax.jit(lambda im, ss, gg: compaction.compact(im, ss, gg, lid, seg))(img, s, g)

@jax.jit
def e1(c):
    curv, ok = F.curvature(c, cfg.feat)
    picked = F.occlusion_mask(c, cfg.feat)
    return curv.sum() + ok.sum() + picked.sum()

bench("extract: curvature+occlusion", e1, cloud)

@jax.jit
def e2(c):
    fs = F.extract(c, cfg.feat, cfg.cap)
    return fs.sharp.xyz.sum()
bench("extract: full", e2, cloud)

# voxel_downsample on the less-flat-sized input (65536).
pp = cloud.xyz.reshape(-1, 3)
mm = cloud.valid.reshape(-1)
bench("voxel_downsample 65k", jax.jit(
    lambda a, b: voxel.voxel_downsample(a, b, 0.2, cfg.cap.less_flat_pad)[0]),
    pp, mm)
bench("voxel_decimate 65k", jax.jit(
    lambda a, b: voxel.voxel_decimate(a, b, 0.2, cfg.cap.less_flat_pad)[0]),
    pp, mm)

# nonzero compaction cost at 64k.
bench("nonzero(size=4096) 64k", jax.jit(
    lambda b: jnp.nonzero(b, size=4096, fill_value=0)[0].sum()), mm)

# argsort costs.
keys = jnp.asarray(np.random.default_rng(0).integers(0, 1 << 30, 65536), jnp.int32)
bench("argsort 65k i32", jax.jit(lambda k: jnp.argsort(k).sum()), keys)
big_keys = jnp.asarray(np.random.default_rng(0).integers(0, 1 << 30, 716800), jnp.int32)
bench("argsort 717k i32", jax.jit(lambda k: jnp.argsort(k).sum()), big_keys)

# scatter-min 717k -> 262k buckets.
bigp = jnp.asarray(np.random.default_rng(1).normal(0, 40, (716800, 3)), jnp.float32)
bigm = jnp.ones((716800,), bool)
bench("voxel_decimate 717k", jax.jit(
    lambda a, b: voxel.voxel_decimate(a, b, 0.3, 65536)[0]), bigp, bigm)

@jax.jit
def scat(a, b):
    n = a.shape[0]
    h = (jnp.floor(a / 0.3).astype(jnp.int32) * jnp.array([73856093, 19349669, 83492791])).sum(-1)
    bucket = (h & ((1 << 18) - 1)).astype(jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)
    return jnp.full((1 << 18,), n, jnp.int32).at[
        jnp.where(b, bucket, 0)].min(jnp.where(b, idx, n), mode="drop").sum()
bench("scatter-min 717k", scat, bigp, bigm)
