"""Tests: stereo matching on a synthetic shift pair; pose optimization recovery."""
import cv2
import numpy as np
import jax
import jax.numpy as jnp

from airdos_tpu.features.orb import OrbExtractor
from airdos_tpu.matching.stereo import stereo_match, stack_pyramid
from airdos_tpu.ops.pyramid import build_pyramid, level_shapes
from airdos_tpu.solvers.pose_opt import pose_optimize
from airdos_tpu.geometry.se3 import se3_exp, se3_apply, se3_inverse


def textured_image(rng, h=240, w=320):
    img = (rng.uniform(0, 255, (h, w))).astype(np.float32)
    img = cv2.GaussianBlur(img, (0, 0), 2.0)
    img = cv2.normalize(img, None, 0, 255, cv2.NORM_MINMAX)
    return img.astype(np.float32)


def test_stereo_match_constant_shift(rng):
    h, w = 240, 320
    disp_gt = 17.0
    base = textured_image(rng, h, w + 64)
    imL = base[:, 32:32 + w]
    imR = base[:, 32 + int(disp_gt):32 + int(disp_gt) + w]   # uR = uL - disp

    ext = OrbExtractor(n_features=400, n_levels=4)
    fL = ext(jnp.asarray(imL))
    fR = ext(jnp.asarray(imR))

    pyrL = build_pyramid(jnp.asarray(imL), None, 4, 1.2)
    pyrR = build_pyramid(jnp.asarray(imR), None, 4, 1.2)
    widths = jnp.asarray([s[1] for s in level_shapes(h, w, 4, 1.2)], jnp.int32)
    scales = jnp.asarray(ext.scales, jnp.float32)
    bf, baseline = 100.0, 0.5   # maxD = 200 px

    m = stereo_match(fL.xy, fL.octave, fL.desc32, fL.valid,
                     fR.xy, fR.octave, fR.desc32, fR.valid,
                     stack_pyramid(pyrL.images), stack_pyramid(pyrR.images),
                     widths, scales, jnp.float32(bf), jnp.float32(baseline))

    depth = np.asarray(m.depth)
    ur = np.asarray(m.u_right)
    uL = np.asarray(fL.xy[:, 0])
    ok = depth > 0
    assert ok.sum() > 100, ok.sum()
    disp = uL[ok] - ur[ok]
    # majority of matched disparities within half pixel of ground truth
    frac = np.mean(np.abs(disp - disp_gt) < 0.5)
    assert frac > 0.9, (frac, np.median(disp))


def test_pose_optimize_recovers_pose(rng):
    fx = fy = 500.0
    cx, cy = 320.0, 180.0
    bf = 250.0
    n = 300
    xw = rng.uniform([-5, -3, 4], [5, 3, 25], (n, 3)).astype(np.float32)

    xi_gt = np.array([0.1, -0.05, 0.2, 0.02, -0.03, 0.01], np.float32)
    Rgt, tgt = se3_exp(jnp.asarray(xi_gt))
    xc = se3_apply(Rgt, tgt, jnp.asarray(xw))
    z = np.asarray(xc[:, 2])
    u = fx * np.asarray(xc[:, 0]) / z + cx
    v = fy * np.asarray(xc[:, 1]) / z + cy
    ur = u - bf / z
    obs = np.stack([u, v, ur], axis=1).astype(np.float32)
    obs[:, :2] += rng.normal(0, 0.3, (n, 2))

    # 10% outliers
    n_out = n // 10
    out_idx = rng.choice(n, n_out, replace=False)
    obs[out_idx, :2] += rng.uniform(20, 60, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))

    # mark 30 edges as mono
    obs[:30, 2] = -1.0

    xi0 = xi_gt + np.array([0.05, 0.05, -0.08, 0.01, 0.02, -0.015], np.float32)
    R0, t0 = se3_exp(jnp.asarray(xi0))

    res = pose_optimize(R0, t0, jnp.asarray(xw), jnp.asarray(obs),
                        jnp.ones((n,), jnp.float32), jnp.ones((n,), bool),
                        fx, fy, cx, cy, bf)

    # pose error
    Ri, ti = se3_inverse(res.R, res.t)
    dR = np.asarray(Ri) @ np.asarray(Rgt)
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    dt = np.asarray(se3_apply(Ri, ti, tgt * 0) )  # camera centre difference
    terr = np.linalg.norm(np.asarray(res.t) - np.asarray(tgt))
    assert ang < 0.05, ang
    assert terr < 0.01, terr
    # outliers rejected
    inl = np.asarray(res.inlier)
    assert inl.sum() > n - n_out - 20
    assert (~inl[out_idx]).mean() > 0.9


def test_pose_optimize_jits_and_reuses(rng):
    fx = fy = 400.0
    cx, cy = 160.0, 120.0
    bf = 80.0
    n = 64
    xw = jnp.asarray(rng.uniform([-2, -2, 3], [2, 2, 10], (n, 3)).astype(np.float32))
    R0, t0 = se3_exp(jnp.zeros(6))
    xc = xw
    u = fx * xc[:, 0] / xc[:, 2] + cx
    v = fy * xc[:, 1] / xc[:, 2] + cy
    obs = jnp.stack([u, v, u - bf / xc[:, 2]], axis=1)
    f = jax.jit(lambda R, t: pose_optimize(R, t, xw, obs, jnp.ones((n,)),
                                           jnp.ones((n,), bool), fx, fy, cx, cy, bf))
    out = f(R0, t0)
    assert int(out.n_inliers) == n
