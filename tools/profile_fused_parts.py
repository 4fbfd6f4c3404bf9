"""Breakdown of the fused tracking step at the 1500-feature budget:
front-end (extract x2 + stereo), motion step, local step — timed as
separate jits at the same padded shapes the fused program uses."""
import sys
sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

import bench
from airdos_tpu.io.synthetic import SyntheticStereoWorld
from airdos_tpu.slam.system import System
from airdos_tpu.slam.fused import motion_model_step, local_map_step


def t_amort(fn, *a, N=10, **kw):
    r = fn(*a, **kw)
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    rs = [fn(*a, **kw) for _ in range(N)]
    np.asarray(jax.tree_util.tree_leaves(rs[-1])[0])
    return (time.perf_counter() - t0) / N * 1e3


for nf in (1000, 1500):
    cfg = bench._cfg(human=False)
    cfg.orb.n_features = nf
    world = SyntheticStereoWorld(seed=0, n_points=500)
    Rwc, twc = world.trajectory(8, 0.1, speed=0.3, yaw_rate=0.005)
    frames = [world.frame(i, Rwc[i], twc[i], i * 0.1, with_humans=False)
              for i in range(8)]
    slam = System(cfg)
    for i in range(7):
        slam.track_stereo(frames[i])
    tr = slam.tracking
    fe = slam.frontend
    data = frames[7]
    imL, imR, maskL, maskR = fe.uploads(data)
    if maskL is None:
        maskL = tr._ones_mask_dev
        maskR = tr._ones_mask_dev
    build = jax.jit(lambda l, r, ml, mr: fe._build_impl(
        l.astype(jnp.float32), r.astype(jnp.float32),
        ml.astype(jnp.float32), mr.astype(jnp.float32),
        jnp.full((1, 2), -1.0), with_disparity=False))
    ms_build = t_amort(build, imL, imR, maskL, maskR)

    # full fused step with the args tracking stashed
    step_args, want_disp = tr._last_step_args
    ms_full = t_amort(tr._full_step, *step_args, with_disparity=want_disp)

    # motion + local standalone at the same shapes
    fL, fR, sm, xy_un, disp = jax.jit(
        lambda l, r, ml, mr: fe._build_impl(
            l.astype(jnp.float32), r.astype(jnp.float32),
            ml.astype(jnp.float32), mr.astype(jnp.float32),
            jnp.full((1, 2), -1.0), with_disparity=False))(
        imL, imR, maskL, maskR)
    (iL, iR, mL, mR, torso, prior, last_f32, desc_p, cand_f32, desc_c,
     fwd, bwd) = step_args
    cam = cfg.camera
    sf = jnp.asarray([cfg.orb.scale_factor ** l
                      for l in range(cfg.orb.n_levels)], jnp.float32)
    isig = 1.0 / (sf ** 2)
    import math
    log_scale = float(math.log(cfg.orb.scale_factor))
    mot = jax.jit(lambda: motion_model_step(
        last_f32[:, 0:3], desc_p, last_f32[:, 4].astype(jnp.int32),
        last_f32[:, 3], last_f32[:, 5] > 0, last_f32[:, 6] > 0,
        prior[:9].reshape(3, 3), prior[9:12],
        xy_un, sm.u_right, fL.octave, fL.angle, fL.desc32, fL.valid,
        isig[fL.octave], cam.fx, cam.fy, cam.cx, cam.cy, cam.bf,
        cam.width, cam.height, sf, 7.0, fwd, bwd))
    loc = jax.jit(lambda: local_map_step(
        cand_f32[:, 0:3], desc_c, cand_f32[:, 8] > 0, cand_f32[:, 3:6],
        cand_f32[:, 6], cand_f32[:, 7],
        last_f32[:, 0:3], last_f32[:, 5] > 0, last_f32[:, 6] > 0,
        prior[:9].reshape(3, 3), prior[9:12], jnp.zeros(3),
        xy_un, sm.u_right, fL.octave, fL.desc32, fL.valid, isig[fL.octave],
        cam.fx, cam.fy, cam.cx, cam.cy, cam.bf, cam.width, cam.height,
        sf, log_scale, cfg.orb.n_levels, 1.0))
    print(f"nf={nf}: full_step {ms_full:.1f} ms  build(fe+stereo) "
          f"{ms_build:.1f} ms  motion {t_amort(mot):.1f} ms  "
          f"local {t_amort(loc):.1f} ms  "
          f"[slots={int(fL.valid.shape[0])}, cand={cand_f32.shape[0]}]")
    slam.shutdown()
