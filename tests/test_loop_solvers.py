"""Sim3 RANSAC, Sim3 refinement, and essential-graph optimization tests."""
import numpy as np
import jax.numpy as jnp

from airdos_tpu.geometry.se3 import se3_exp, so3_exp
from airdos_tpu.solvers.sim3 import sim3_ransac, optimize_sim3
from airdos_tpu.solvers.pose_graph import optimize_essential_graph


def test_sim3_ransac_recovers_transform(rng):
    fx = fy = 400.0
    cx, cy = 160.0, 120.0
    n = 50
    x2 = rng.uniform([-3, -2, 4], [3, 2, 15], (n, 3)).astype(np.float32)
    R_gt = np.asarray(so3_exp(jnp.asarray([0.05, 0.3, -0.1])))
    t_gt = np.array([0.5, -0.2, 0.8], np.float32)
    x1 = (R_gt @ x2.T).T + t_gt
    x1 += rng.normal(0, 0.01, x1.shape)
    out = rng.choice(n, 10, replace=False)
    x1[out] += rng.uniform(1, 3, (10, 3))

    samples = rng.integers(0, n, (128, 3)).astype(np.int32)
    res = sim3_ransac(jnp.asarray(x1.astype(np.float32)), jnp.asarray(x2),
                      jnp.ones(n, bool), jnp.asarray(samples),
                      jnp.full(n, 9.21 * 4, jnp.float32),
                      jnp.full(n, 9.21 * 4, jnp.float32),
                      fx, fy, cx, cy, fix_scale=True)
    assert int(res.n_inliers) >= 35
    dR = np.asarray(res.R) @ R_gt.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 1.0, ang
    assert np.linalg.norm(np.asarray(res.t) - t_gt) < 0.1


def test_optimize_sim3_refines(rng):
    fx = fy = 400.0
    cx, cy = 160.0, 120.0
    n = 40
    x2 = rng.uniform([-3, -2, 4], [3, 2, 12], (n, 3)).astype(np.float32)
    R_gt = np.asarray(so3_exp(jnp.asarray([0.02, 0.2, -0.05])))
    t_gt = np.array([0.3, -0.1, 0.5], np.float32)
    x1 = ((R_gt @ x2.T).T + t_gt).astype(np.float32)
    obs1 = np.stack([fx * x1[:, 0] / x1[:, 2] + cx,
                     fy * x1[:, 1] / x1[:, 2] + cy], axis=1).astype(np.float32)
    obs2 = np.stack([fx * x2[:, 0] / x2[:, 2] + cx,
                     fy * x2[:, 1] / x2[:, 2] + cy], axis=1).astype(np.float32)
    # start from a perturbed estimate
    R0 = np.asarray(so3_exp(jnp.asarray([0.0, 0.03, 0.0]))) @ R_gt
    t0 = t_gt + np.array([0.05, -0.03, 0.02], np.float32)
    R, t, s, inl, n_in = optimize_sim3(
        jnp.asarray(R0.astype(np.float32)), jnp.asarray(t0), jnp.float32(1.0),
        jnp.asarray(x1), jnp.asarray(obs1), jnp.ones(n, jnp.float32),
        jnp.asarray(x2), jnp.asarray(obs2), jnp.ones(n, jnp.float32),
        jnp.ones(n, bool), fx, fy, cx, cy)
    dR = np.asarray(R) @ R_gt.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 0.1, ang
    assert np.linalg.norm(np.asarray(t) - t_gt) < 0.02
    assert int(n_in) >= n - 2


def test_essential_graph_closes_loop(rng):
    """A drifted odometry chain with one loop-closure edge back to the
    start: the graph should distribute the correction."""
    K = 12
    # ground truth: cameras on a circle segment
    gt_R, gt_t = [], []
    for k in range(K):
        xi = np.array([0.4 * k, 0, 0, 0, 0.12 * k, 0], np.float32)
        R, t = se3_exp(jnp.asarray(xi))
        gt_R.append(np.asarray(R))
        gt_t.append(np.asarray(t))
    # drifted estimates: growing error
    est_R, est_t = [], []
    for k in range(K):
        dxi = np.concatenate([0.02 * k * np.ones(3), 0.004 * k * np.ones(3)]).astype(np.float32)
        dR, dt = se3_exp(jnp.asarray(dxi))
        est_R.append(np.asarray(dR) @ gt_R[k])
        est_t.append(np.asarray(dR) @ gt_t[k] + np.asarray(dt))
    est_R = np.stack(est_R)
    est_t = np.stack(est_t)
    ones = np.ones(K, np.float32)

    # odometry edges from DRIFTED relative poses (consistent locally);
    # loop edge K-1 -> 0 from GROUND TRUTH (the loop detection)
    e_i, e_j, Rm, tm = [], [], [], []
    for k in range(K - 1):
        # measurement S_ji maps vertex i into j: S_m = S_j * S_i^-1 (drifted)
        Rj, tj = est_R[k + 1], est_t[k + 1]
        Ri, ti = est_R[k], est_t[k]
        Rrel = Rj @ Ri.T
        trel = tj - Rrel @ ti
        e_i.append(k)
        e_j.append(k + 1)
        Rm.append(Rrel)
        tm.append(trel)
    # loop edge: 0 <- K-1 with TRUE relative pose
    Rj, tj = gt_R[0], gt_t[0]
    Ri, ti = gt_R[K - 1], gt_t[K - 1]
    Rrel = Rj @ Ri.T
    trel = tj - Rrel @ ti
    e_i.append(K - 1)
    e_j.append(0)
    Rm.append(Rrel)
    tm.append(trel)

    # measurement convention check: e = log(S_m * S_i * S_j^-1)
    fixed = np.zeros(K, bool)
    fixed[0] = True
    E = len(e_i)
    R_out, t_out, s_out = optimize_essential_graph(
        jnp.asarray(est_R), jnp.asarray(est_t), jnp.asarray(ones),
        jnp.asarray(fixed),
        jnp.asarray(np.asarray(e_i, np.int32)), jnp.asarray(np.asarray(e_j, np.int32)),
        jnp.asarray(np.stack(Rm).astype(np.float32)),
        jnp.asarray(np.stack(tm).astype(np.float32)),
        jnp.ones(E, jnp.float32),
        jnp.ones(E, bool))
    # the last KF (loop end) should be pulled toward its true pose
    err_before = np.linalg.norm(est_t[K - 1] - gt_t[K - 1])
    err_after = np.linalg.norm(np.asarray(t_out)[K - 1] - gt_t[K - 1])
    assert err_after < 0.5 * err_before, (err_before, err_after)
    # scales remain ~1
    np.testing.assert_allclose(np.asarray(s_out), np.ones(K), atol=1e-3)
