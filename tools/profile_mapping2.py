"""Mapping-tick decomposition with pipelined timing (one sync per batch,
so the ~25 ms tunnel round-trip does not poison per-op numbers)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sc_lego_loam_tpu.config import synthetic_config
from sc_lego_loam_tpu.pipeline import SlamEngine, _build_submap, _sc_input
from sc_lego_loam_tpu import mapping
from sc_lego_loam_tpu.utils import synthetic, se3

cfg = synthetic_config()
print("backend:", jax.default_backend(), flush=True)

N = 24
scans, valids, gt = synthetic.make_sequence(cfg.lidar, N, trajectory="straight",
                                            step=0.4, noise=0.01, seed=11,
                                            shuffle=False)
eng = SlamEngine(cfg)
for i in range(N):
    p = eng.process_scan(jnp.asarray(scans[i]), jnp.asarray(valids[i]),
                         t=i * 0.1)
jax.block_until_ready(p)
st = eng.state
print("keyframes:", int(st.map.kf.count), flush=True)


def bench(name, fn, n=20):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name:<38} {(time.perf_counter()-t0)/n*1e3:8.2f} ms", flush=True)


pts = jnp.asarray(scans[-1])
msk = jnp.asarray(valids[-1])

c, cm, s, sm, o, om = mapping.downsample_scan(
    cfg, st.odo.corner_last.xyz, st.odo.corner_last.mask,
    st.odo.surf_last.xyz, st.odo.surf_last.mask,
    jnp.zeros((cfg.cap.outlier_pad, 3)), jnp.zeros((cfg.cap.outlier_pad,), bool))
surf_q = jnp.concatenate([s, o])
surf_qm = jnp.concatenate([sm, om])
T_guess = st.map.pose

ds = jax.jit(lambda: mapping.downsample_scan(
    cfg, st.odo.corner_last.xyz, st.odo.corner_last.mask,
    st.odo.surf_last.xyz, st.odo.surf_last.mask,
    jnp.zeros((cfg.cap.outlier_pad, 3)), jnp.zeros((cfg.cap.outlier_pad,), bool)))
bench("downsample_scan", ds)
bench("build_submap", lambda: _build_submap(cfg, st.map.kf))
bench("scan_to_map", lambda: mapping.scan_to_map(
    cfg, T_guess, c, cm, surf_q, surf_qm,
    st.sub_c, st.sub_cm, st.sub_s, st.sub_sm))
bench("sc descriptor (raw cloud)", lambda: _sc_input(cfg, pts, msk))
ins = jax.jit(lambda kf: mapping.insert_keyframe(
    cfg, jax.tree.map(jnp.copy, kf), T_guess, jnp.float32(1.0),
    c, cm, s, sm, o, om))
bench("insert_keyframe(+copy)", lambda: ins(st.map.kf))

# loop tick
from sc_lego_loam_tpu import loop as loop_mod
kf = st.map.kf
cur = jnp.maximum(kf.count - 1, 0)



import functools
jit_tick = jax.jit(functools.partial(loop_mod.device_tick, cfg))
bench("loop.device_tick (jit, no loop hit)",
      lambda: jit_tick(jax.tree.map(jnp.copy, kf), st.bank, st.loops,
                       st.bank.desc[cur]))
# Force a verify+resolve: craft times so RS fires (old kf within 20 m).
kf2 = kf._replace(times=kf.times.at[jnp.arange(8)].set(
    jnp.arange(8) * 40.0), count=jnp.int32(8))
bench("loop.device_tick (jit, RS fires)",
      lambda: jit_tick(jax.tree.map(jnp.copy, kf2), st.bank, st.loops,
                       st.bank.desc[cur]))
