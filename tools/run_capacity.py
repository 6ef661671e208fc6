#!/usr/bin/env python
"""DCC-scale capacity runway (VERDICT r4 item: "a 16k-keyframe run
completes, bounded memory, no silent overwrite").

Part 1 drives a tiny-sensor engine through 16384 keyframe inserts plus
overflow (keyframe_dist=0 so every mapping tick inserts) and checks the
drop-not-clobber policy end-to-end: count saturates at the cap, the
kf_dropped counter reports the overflow, the host warning fires, and the
newest stored keyframe stays intact.

Part 2 allocates the FULL-SIZE OS1-64 mapper state at max_keyframes=16384
(~3.1 GB, CapacityConfig budget) and runs one real mapping_step on it —
the HBM-fit proof for the 5 km-sequence configuration.
"""
import dataclasses
import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from sc_lego_loam_tpu.config import tiny_test_config, synthetic_config
from sc_lego_loam_tpu import pipeline
from sc_lego_loam_tpu.utils import synthetic

K = 16384
EXTRA = 64


def part1_tiny_runway():
    cfg = tiny_test_config()
    cfg = cfg.replace(
        cap=dataclasses.replace(cfg.cap, max_keyframes=K,
                                max_scans=K + EXTRA + 8),
        mapping=dataclasses.replace(cfg.mapping, keyframe_dist=0.0,
                                    process_interval=0.0),
        loop=dataclasses.replace(cfg.loop, enabled=False),
    )
    scans, valids, _ = synthetic.make_sequence(
        cfg.lidar, 8, trajectory="straight", step=0.3, noise=0.01, seed=4)
    eng = pipeline.SlamEngine(cfg)
    n = K + EXTRA
    t0 = time.time()
    got_warning = []
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        for i in range(n):
            eng.process_scan(scans[i % 8], valids[i % 8], t=i * 0.1)
            if i % 4096 == 4095:
                print(f"  tick {i+1}/{n}  kf={int(eng.map.kf.count)}  "
                      f"dropped={int(eng.m.kf_dropped)}  "
                      f"{(time.time()-t0)/(i+1)*1e3:.2f} ms/tick",
                      flush=True)
        eng._check_caps()
        got_warning = [x for x in w if "keyframe bank full" in str(x.message)]
    count = int(eng.map.kf.count)
    dropped = int(eng.m.kf_dropped)
    traj = eng.trajectory_array()
    assert count == K, count
    assert dropped == EXTRA, dropped
    assert got_warning, "host overflow warning did not fire"
    assert np.isfinite(traj).all()
    # Newest stored keyframe intact (not clobbered by the dropped ones).
    assert bool(eng.map.kf.corner_mask[K - 1].any())
    print(f"part1 OK: {K} keyframes + {dropped} dropped in "
          f"{time.time()-t0:.0f}s, warning fired, newest slot intact")


def part2_fullsize_alloc():
    cfg = synthetic_config()
    assert cfg.cap.max_keyframes == K
    mst = pipeline.init_mapper_state(cfg)
    jax.block_until_ready(mst.kf.surf)
    gb = sum(x.size * x.dtype.itemsize
             for x in jax.tree.leaves(mst)) / 2**30
    scans, valids, _ = synthetic.make_sequence(
        cfg.lidar, 1, trajectory="straight", step=0.4, noise=0.01, seed=4,
        shuffle=False)
    eng = pipeline.SlamEngine(cfg)
    pose = eng.process_scan(scans[0], valids[0], t=0.0)
    jax.block_until_ready(pose)
    assert int(eng.map.kf.count) == 1
    print(f"part2 OK: full-size mapper state = {gb:.2f} GiB on "
          f"{jax.default_backend()}, one mapping_step ran (kf=1)")


if __name__ == "__main__":
    part2_fullsize_alloc()
    part1_tiny_runway()
