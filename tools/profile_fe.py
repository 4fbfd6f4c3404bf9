import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np
import jax, jax.numpy as jnp
import bench
from airdos_tpu.io.synthetic import SyntheticStereoWorld
from airdos_tpu.slam.system import System
from airdos_tpu.ops.pyramid import build_pyramid, level_shapes
from airdos_tpu.matching.stereo import stack_pyramid
from airdos_tpu.matching.stereo import stereo_match

n_total = 8
world = SyntheticStereoWorld(seed=0, n_points=500)
Rwc, twc = world.trajectory(n_total, 0.1, speed=0.3, yaw_rate=0.005)
frames = [world.frame(i, Rwc[i], twc[i], i * 0.1, with_humans=False)
          for i in range(n_total)]
cfg = bench._cfg(human=False)
slam = System(cfg)
for i in range(7):
    slam.track_stereo(frames[i])
fe = slam.frontend
orb = cfg.orb
data = frames[7]
imL, imR, maskL, maskR = fe.uploads(data)
tr = slam.tracking
if maskL is None:
    maskL = tr._ones_mask_dev; maskR = tr._ones_mask_dev

def t_amort(fn, *a, N=10):
    rs = fn(*a)
    jax.device_get(jax.tree_util.tree_leaves(rs)[0])
    t0 = time.perf_counter()
    rs = [fn(*a) for _ in range(N)]
    jax.device_get(jax.tree_util.tree_leaves(rs[-1])[0])
    return (time.perf_counter() - t0) / N * 1e3

pyr_fn = jax.jit(lambda l, ml: build_pyramid(l.astype(jnp.float32),
                                             ml.astype(jnp.float32),
                                             orb.n_levels, orb.scale_factor))
print(f"pyramid (1 image): {t_amort(pyr_fn, imL, maskL):.1f} ms")

pyrL = pyr_fn(imL, maskL)
ext_fn = jax.jit(lambda p: fe.extractor._extract_from_pyramid(p))
print(f"extract (1 image): {t_amort(ext_fn, pyrL):.1f} ms")

pyrR = pyr_fn(imR, maskR)
fL = ext_fn(pyrL); fR = ext_fn(pyrR)
h, w = 360, 640
widths = jnp.asarray([s[1] for s in level_shapes(h, w, orb.n_levels, orb.scale_factor)], jnp.int32)
scales = jnp.asarray(fe.extractor.scales, jnp.float32)
sm_fn = jax.jit(lambda fL, fR, pl, pr: stereo_match(
    fL.xy, fL.octave, fL.desc32, fL.valid, fR.xy, fR.octave, fR.desc32,
    fR.valid, pl, pr, widths, scales, jnp.float32(cfg.camera.bf),
    jnp.float32(cfg.camera.baseline)))
spl, spr = stack_pyramid(pyrL.images), stack_pyramid(pyrR.images)
print(f"stereo_match: {t_amort(sm_fn, fL, fR, spl, spr):.1f} ms")

# dissect extract stages at level 0 (largest)
from airdos_tpu.ops.fast import fast_score_map
from airdos_tpu.ops.orientation import keypoint_angles
from airdos_tpu.ops.filters import gaussian_blur7
from airdos_tpu.ops.brief import compute_descriptors
im0 = pyrL.images[0]; m0 = pyrL.masks[0]
q0 = fe.extractor.quotas[0]
print("quotas:", fe.extractor.quotas, "sum:", sum(fe.extractor.quotas))
f_score = jax.jit(lambda im, m: fast_score_map(im) * m)
print(f"fast_score_map L0: {t_amort(f_score, im0, m0):.2f} ms")
f_blur = jax.jit(gaussian_blur7)
print(f"gaussian_blur7 L0: {t_amort(f_blur, im0):.2f} ms")
score0 = f_score(im0, m0)
from airdos_tpu.features.orb import _select_level_keypoints, _cell_size_for, MIN_BORDER
h0, w0 = im0.shape
cell = _cell_size_for(h0 - 2*MIN_BORDER, w0 - 2*MIN_BORDER, q0)
f_sel = jax.jit(lambda s: _select_level_keypoints(s, q0, cell, fe.extractor.ini_th, fe.extractor.min_th))
print(f"select L0: {t_amort(f_sel, score0):.2f} ms")
xs, ys, resp = f_sel(score0)
f_ang = jax.jit(lambda im, xs, ys: keypoint_angles(im, xs, ys))
print(f"angles L0: {t_amort(f_ang, im0, xs, ys):.2f} ms")
b0 = f_blur(im0)
f_desc = jax.jit(compute_descriptors)
ang = f_ang(im0, xs, ys)
print(f"descriptors L0: {t_amort(f_desc, b0, xs, ys, ang):.2f} ms")
