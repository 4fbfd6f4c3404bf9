"""Unit tests for SO3/SE3/Sim3 and the stereo camera, vs scipy oracles."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as Rsp

from airdos_tpu.geometry import (
    so3_exp, so3_log, se3_exp, se3_log, se3_compose, se3_inverse, se3_apply,
    sim3_exp, sim3_log, sim3_compose, sim3_inverse, sim3_apply,
    quat_to_rot, rot_to_quat, StereoCamera,
)
from airdos_tpu.config import CameraConfig


def rand_rotvecs(rng, n):
    v = rng.standard_normal((n, 3))
    scale = rng.uniform(0, 3.0, (n, 1))
    return (v / np.linalg.norm(v, axis=1, keepdims=True) * scale).astype(np.float32)


def test_so3_exp_matches_scipy(rng):
    w = rand_rotvecs(rng, 64)
    R = np.asarray(so3_exp(jnp.asarray(w)))
    R_sp = Rsp.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_sp, atol=1e-5)


def test_so3_log_roundtrip(rng):
    w = rand_rotvecs(rng, 64)
    R = Rsp.from_rotvec(w).as_matrix().astype(np.float32)
    w2 = np.asarray(so3_log(jnp.asarray(R)))
    R2 = Rsp.from_rotvec(w2).as_matrix()
    np.testing.assert_allclose(R2, R, atol=1e-4)


def test_so3_log_small_and_pi():
    # tiny angle
    w = jnp.array([[1e-9, -2e-9, 1e-9]], jnp.float32)
    np.testing.assert_allclose(np.asarray(so3_log(so3_exp(w))), np.asarray(w), atol=1e-7)
    # angle near pi
    axis = np.array([0.6, -0.64, 0.48])
    axis /= np.linalg.norm(axis)
    w = (axis * (np.pi - 1e-4)).astype(np.float32)[None]
    R = Rsp.from_rotvec(w).as_matrix().astype(np.float32)
    w2 = np.asarray(so3_log(jnp.asarray(R)))
    R2 = Rsp.from_rotvec(w2).as_matrix()
    np.testing.assert_allclose(R2[0], R[0], atol=2e-3, rtol=0)


def test_quat_roundtrip(rng):
    w = rand_rotvecs(rng, 32)
    R = Rsp.from_rotvec(w).as_matrix().astype(np.float32)
    q = np.asarray(rot_to_quat(jnp.asarray(R)))
    q_sp = Rsp.from_matrix(R).as_quat()  # scipy: (x, y, z, w)
    # same up to sign; we canonicalise w >= 0
    q_sp = q_sp * np.where(q_sp[:, 3:4] < 0, -1, 1)
    np.testing.assert_allclose(q, q_sp, atol=1e-4)
    R2 = np.asarray(quat_to_rot(jnp.asarray(q)))
    np.testing.assert_allclose(R2, R, atol=1e-5)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.uniform(-1, 1, (64, 6)).astype(np.float32)
    xi[:, 3:] = rand_rotvecs(rng, 64) * 0.8
    R, t = se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(se3_log(R, t))
    np.testing.assert_allclose(xi2, xi, atol=1e-4)


def test_se3_compose_inverse(rng):
    xi = rng.uniform(-1, 1, (8, 6)).astype(np.float32)
    R, t = se3_exp(jnp.asarray(xi))
    Ri, ti = se3_inverse(R, t)
    Rc, tc = se3_compose(R, t, Ri, ti)
    np.testing.assert_allclose(np.asarray(Rc), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tc), np.zeros((8, 3)), atol=1e-5)


def test_se3_apply(rng):
    xi = rng.uniform(-1, 1, (6,)).astype(np.float32)
    R, t = se3_exp(jnp.asarray(xi))
    x = rng.standard_normal((10, 3)).astype(np.float32)
    y = np.asarray(se3_apply(R, t, jnp.asarray(x)))
    y_np = (np.asarray(R) @ x.T).T + np.asarray(t)
    np.testing.assert_allclose(y, y_np, atol=1e-5)


def test_sim3_exp_log_roundtrip(rng):
    xi = rng.uniform(-0.8, 0.8, (32, 7)).astype(np.float32)
    xi[:, 3:6] = rand_rotvecs(rng, 32) * 0.7
    R, t, s = sim3_exp(jnp.asarray(xi))
    xi2 = np.asarray(sim3_log(R, t, s))
    np.testing.assert_allclose(xi2, xi, atol=2e-4)


def test_sim3_compose_inverse_apply(rng):
    xi = rng.uniform(-0.5, 0.5, (4, 7)).astype(np.float32)
    R, t, s = sim3_exp(jnp.asarray(xi))
    Ri, ti, si = sim3_inverse(R, t, s)
    x = rng.standard_normal((4, 3)).astype(np.float32)
    y = sim3_apply(R, t, s, jnp.asarray(x))
    x2 = sim3_apply(Ri, ti, si, y)
    np.testing.assert_allclose(np.asarray(x2), x, atol=1e-5)
    Rc, tc, sc = sim3_compose(R, t, s, Ri, ti, si)
    np.testing.assert_allclose(np.asarray(sc), np.ones(4), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tc), np.zeros((4, 3)), atol=1e-5)


def test_sim3_sigma_zero_matches_se3(rng):
    xi6 = rng.uniform(-1, 1, (8, 6)).astype(np.float32)
    xi7 = np.concatenate([xi6, np.zeros((8, 1), np.float32)], axis=1)
    R6, t6 = se3_exp(jnp.asarray(xi6))
    R7, t7, s7 = sim3_exp(jnp.asarray(xi7))
    np.testing.assert_allclose(np.asarray(R7), np.asarray(R6), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t7), np.asarray(t6), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s7), np.ones(8), atol=1e-6)


# ------------------------------------------------------------------ camera

def make_cam():
    cfg = CameraConfig(fx=772.5483, fy=772.5483, cx=320.0, cy=180.0,
                       width=640, height=360, bf=193.1371)
    return StereoCamera.from_config(cfg)


def test_project_unproject_roundtrip(rng):
    cam = make_cam()
    uv = rng.uniform([0, 0], [640, 360], (100, 2)).astype(np.float32)
    depth = rng.uniform(0.5, 30.0, (100,)).astype(np.float32)
    xc = cam.unproject(jnp.asarray(uv), jnp.asarray(depth))
    uv2 = np.asarray(cam.project(xc))
    np.testing.assert_allclose(uv2, uv, atol=1e-3)


def test_stereo_projection_disparity(rng):
    cam = make_cam()
    xc = jnp.asarray(rng.uniform([-5, -3, 1], [5, 3, 30], (50, 3)).astype(np.float32))
    uvr = cam.project_stereo(xc)
    disp = np.asarray(uvr[..., 0] - uvr[..., 2])
    depth = np.asarray(cam.depth_from_disparity(jnp.asarray(disp)))
    np.testing.assert_allclose(depth, np.asarray(xc[..., 2]), rtol=1e-4)


def test_undistort_roundtrip(rng):
    cfg = CameraConfig(fx=458.654, fy=457.296, cx=367.215, cy=248.375,
                       k1=-0.28340811, k2=0.07395907, p1=0.00019359, p2=1.76187114e-05,
                       width=752, height=480, bf=47.9)
    cam = StereoCamera.from_config(cfg)
    # ground-truth undistorted pixels -> distort -> undistort back
    uv_gt = rng.uniform([100, 100], [650, 380], (64, 2)).astype(np.float32)
    xn = jnp.stack([(uv_gt[:, 0] - cfg.cx) / cfg.fx, (uv_gt[:, 1] - cfg.cy) / cfg.fy], axis=-1)
    xd = cam.distort(xn)
    uv_dist = jnp.stack([xd[:, 0] * cfg.fx + cfg.cx, xd[:, 1] * cfg.fy + cfg.cy], axis=-1)
    uv_rec = np.asarray(cam.undistort_points(uv_dist, iters=8))
    np.testing.assert_allclose(uv_rec, uv_gt, atol=0.05)


def test_camera_jit_pytree():
    cam = make_cam()

    @jax.jit
    def f(c: StereoCamera, x):
        return c.project_stereo(x)

    out = f(cam, jnp.ones((4, 3)))
    assert out.shape == (4, 3)
