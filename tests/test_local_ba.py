"""Local BA solver: convergence on a synthetic multi-camera graph."""
import numpy as np
import jax.numpy as jnp

from airdos_tpu.geometry.se3 import se3_exp, se3_apply
from airdos_tpu.solvers.local_ba import local_bundle_adjust


def make_problem(rng, C=6, P=120, noise=0.1, n_fixed=2):
    # noise=0.1 px: the statistical floor of this geometry (f64 scipy LM
    # run to ftol 1e-12) is ~0.022 median point error, so the 0.03
    # assertion below genuinely tests solver convergence.  At noise=0.3
    # the floor is 0.065 — above the threshold — so any solver would fail.
    fx = fy = 400.0
    cx, cy = 160.0, 120.0
    bf = 80.0
    pts_gt = rng.uniform([-4, -3, 5], [4, 3, 20], (P, 3)).astype(np.float32)
    cams = []
    for c in range(C):
        xi = np.zeros(6, np.float32)
        xi[:3] = [0.3 * c, 0.02 * c, 0.1 * c]
        xi[3:] = rng.normal(0, 0.02, 3)
        R, t = se3_exp(jnp.asarray(xi))
        cams.append((np.asarray(R), np.asarray(t)))
    e_cam, e_pt, e_obs = [], [], []
    for c, (R, t) in enumerate(cams):
        xc = (R @ pts_gt.T).T + t
        z = xc[:, 2]
        u = fx * xc[:, 0] / z + cx
        v = fy * xc[:, 1] / z + cy
        ur = u - bf / z
        ok = (z > 0.5) & (u > 0) & (u < 320) & (v > 0) & (v < 240)
        for p in np.nonzero(ok)[0]:
            e_cam.append(c)
            e_pt.append(p)
            e_obs.append([u[p] + rng.normal(0, noise),
                          v[p] + rng.normal(0, noise),
                          ur[p] + rng.normal(0, noise)])
    E = len(e_cam)
    return (fx, fy, cx, cy, bf, pts_gt, cams,
            np.asarray(e_cam, np.int32), np.asarray(e_pt, np.int32),
            np.asarray(e_obs, np.float32))


def test_local_ba_converges(rng):
    fx, fy, cx, cy, bf, pts_gt, cams, e_cam, e_pt, e_obs = make_problem(rng)
    C, P, E = len(cams), len(pts_gt), len(e_cam)

    cam_R = np.stack([c[0] for c in cams])
    cam_t = np.stack([c[1] for c in cams])
    fixed = np.zeros(C, bool)
    fixed[:2] = True

    # perturb free cameras and all points
    cam_R_n = cam_R.copy()
    cam_t_n = cam_t.copy()
    for c in range(2, C):
        dR, dt = se3_exp(jnp.asarray(
            np.concatenate([rng.normal(0, 0.03, 3), rng.normal(0, 0.01, 3)]).astype(np.float32)))
        cam_R_n[c] = np.asarray(dR) @ cam_R[c]
        cam_t_n[c] = np.asarray(dR) @ cam_t[c] + np.asarray(dt)
    pts_n = pts_gt + rng.normal(0, 0.1, pts_gt.shape).astype(np.float32)

    res = local_bundle_adjust(
        jnp.asarray(cam_R_n), jnp.asarray(cam_t_n), jnp.asarray(fixed),
        jnp.asarray(pts_n), jnp.ones(P, bool),
        jnp.asarray(e_cam), jnp.asarray(e_pt), jnp.asarray(e_obs),
        jnp.ones(E, jnp.float32), jnp.ones(E, bool),
        fx, fy, cx, cy, bf)

    R_out = np.asarray(res.R)
    t_out = np.asarray(res.t)
    # fixed cameras untouched
    np.testing.assert_allclose(R_out[:2], cam_R[:2], atol=1e-6)
    np.testing.assert_allclose(t_out[:2], cam_t[:2], atol=1e-6)
    # free cameras recovered
    for c in range(2, C):
        dR = R_out[c] @ cam_R[c].T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 0.15, (c, ang)
        assert np.linalg.norm(t_out[c] - cam_t[c]) < 0.035, c
    # points recovered (median error small)
    perr = np.linalg.norm(np.asarray(res.points) - pts_gt, axis=1)
    assert np.median(perr) < 0.03, np.median(perr)
    assert np.asarray(res.edge_inlier).mean() > 0.95


def test_local_ba_rejects_outliers(rng):
    fx, fy, cx, cy, bf, pts_gt, cams, e_cam, e_pt, e_obs = make_problem(rng, noise=0.2)
    C, P, E = len(cams), len(pts_gt), len(e_cam)
    out = rng.choice(E, E // 10, replace=False)
    e_obs[out, :2] += rng.uniform(15, 40, (len(out), 2)) * rng.choice([-1, 1], (len(out), 2))

    cam_R = np.stack([c[0] for c in cams])
    cam_t = np.stack([c[1] for c in cams])
    fixed = np.zeros(C, bool)
    fixed[:1] = True
    pts_n = pts_gt + rng.normal(0, 0.05, pts_gt.shape).astype(np.float32)

    res = local_bundle_adjust(
        jnp.asarray(cam_R), jnp.asarray(cam_t), jnp.asarray(fixed),
        jnp.asarray(pts_n), jnp.ones(P, bool),
        jnp.asarray(e_cam), jnp.asarray(e_pt), jnp.asarray(e_obs),
        jnp.ones(E, jnp.float32), jnp.ones(E, bool),
        fx, fy, cx, cy, bf)
    inl = np.asarray(res.edge_inlier)
    assert (~inl[out]).mean() > 0.9       # outliers rejected
    mask = np.ones(E, bool)
    mask[out] = False
    assert inl[mask].mean() > 0.9         # inliers kept
