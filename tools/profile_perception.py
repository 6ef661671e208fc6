"""Stage-forced decomposition of the fused perception step (array outputs
so XLA cannot elide work)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sc_lego_loam_tpu.config import synthetic_config
from sc_lego_loam_tpu import frontend, odometry, pipeline
from sc_lego_loam_tpu.ops import projection, ground, segmentation, compaction
from sc_lego_loam_tpu.ops import features as F
from sc_lego_loam_tpu.utils import synthetic

cfg = synthetic_config()
lid, seg = cfg.lidar, cfg.seg
print("backend:", jax.default_backend(), flush=True)

scans, valids, _ = synthetic.make_sequence(cfg.lidar, 3, step=0.5, seed=3)
pts = [jax.device_put(jnp.asarray(s)) for s in scans]
msk = [jax.device_put(jnp.asarray(v)) for v in valids]


def bench(name, fn, n=8, alternate=True):
    for i in range(2):
        jax.block_until_ready(fn(pts[i % 2], msk[i % 2]))
    t0 = time.perf_counter()
    for i in range(n):
        jax.block_until_ready(fn(pts[i % 2 if alternate else 0],
                                 msk[i % 2 if alternate else 0]))
    print(f"{name:<30} {(time.perf_counter()-t0)/n*1e3:8.2f} ms", flush=True)


@jax.jit
def v1(p, m):
    return projection.project(p, m, lid).xyz

@jax.jit
def v2(p, m):
    img = projection.project(p, m, lid)
    return img.xyz, ground.ground_mask(img, lid, seg)

@jax.jit
def v3(p, m):
    img = projection.project(p, m, lid)
    g = ground.ground_mask(img, lid, seg)
    return segmentation.segment(img, g, lid, seg).label

@jax.jit
def v4(p, m):
    img = projection.project(p, m, lid)
    g = ground.ground_mask(img, lid, seg)
    s = segmentation.segment(img, g, lid, seg)
    cl, ol = compaction.compact(img, s, g, lid, seg)
    return cl.xyz, ol.xyz

@jax.jit
def v5(p, m):
    fo = frontend.run(cfg, p, m)
    fs = F.extract(fo.cloud, cfg.feat, cfg.cap)
    return fs.sharp.xyz, fs.less_flat.xyz, fs.flat.xyz

state0 = odometry.init_state(cfg)
fo0 = frontend.run(cfg, pts[0], msk[0])
fs0 = jax.jit(lambda c: F.extract(c, cfg.feat, cfg.cap))(fo0.cloud)
state1, _, _, _, _ = pipeline._perception_step(cfg, pts[0], msk[0], state0)

def v6(p, m):
    return pipeline._perception_step(cfg, p, m, state1)[1]

bench("v1 projection", v1)
bench("v2 +ground", v2)
bench("v3 +segmentation", v3)
bench("v4 +compaction", v4)
bench("v5 +extract", v5)
bench("v6 full perception", v6)

# segmentation while-loop iteration count probe: run with a capped-rounds
# variant to see convergence behavior.
img = jax.jit(lambda p, m: projection.project(p, m, lid))(pts[0], msk[0])
g = jax.jit(lambda im: ground.ground_mask(im, lid, seg))(img)
# count iterations on host
import math
H, W = lid.n_scan, lid.horizon_scan
print("active px:", int((img.valid & ~g).sum()))
