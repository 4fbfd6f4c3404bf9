"""Multi-chip sharded BA: full LM protocol over an 8-device mesh matches
the single-chip solver (conftest forces an 8-device CPU platform)."""
import numpy as np
import jax
import jax.numpy as jnp

from airdos_tpu.geometry.se3 import se3_exp
from airdos_tpu.parallel.sharded_ba import (
    make_mesh, sharded_local_bundle_adjust)
from airdos_tpu.solvers.local_ba import local_bundle_adjust

from test_local_ba import make_problem


def test_sharded_matches_single_chip(rng):
    fx, fy, cx, cy, bf, pts_gt, cams, e_cam, e_pt, e_obs = make_problem(
        rng, C=4, P=48)
    C, P, E = len(cams), len(pts_gt), len(e_cam)
    n_dev = len(jax.devices())
    assert n_dev == 8

    cam_R = np.stack([c[0] for c in cams])
    cam_t = np.stack([c[1] for c in cams])
    fixed = np.zeros(C, bool)
    fixed[:2] = True
    cam_R_n = cam_R.copy()
    cam_t_n = cam_t.copy()
    for c in range(2, C):
        dR, dt = se3_exp(jnp.asarray(np.concatenate(
            [rng.normal(0, 0.03, 3), rng.normal(0, 0.01, 3)]).astype(np.float32)))
        cam_R_n[c] = np.asarray(dR) @ cam_R[c]
        cam_t_n[c] = np.asarray(dR) @ cam_t[c] + np.asarray(dt)
    pts_n = pts_gt + rng.normal(0, 0.05, pts_gt.shape).astype(np.float32)

    # pad edge tables to a multiple of the mesh size
    E_pad = ((E + n_dev - 1) // n_dev) * n_dev
    pad = E_pad - E
    e_cam_p = np.concatenate([e_cam, np.zeros(pad, np.int32)])
    e_pt_p = np.concatenate([e_pt, np.zeros(pad, np.int32)])
    e_obs_p = np.concatenate([e_obs, np.zeros((pad, 3), np.float32)])
    e_info_p = np.concatenate([np.ones(E, np.float32), np.zeros(pad, np.float32)])
    e_valid_p = np.concatenate([np.ones(E, bool), np.zeros(pad, bool)])

    args = (jnp.asarray(cam_R_n), jnp.asarray(cam_t_n), jnp.asarray(fixed),
            jnp.asarray(pts_n), jnp.ones(P, bool),
            jnp.asarray(e_cam_p), jnp.asarray(e_pt_p), jnp.asarray(e_obs_p),
            jnp.asarray(e_info_p), jnp.asarray(e_valid_p))

    single = local_bundle_adjust(*args, fx, fy, cx, cy, bf,
                                 iters1=4, iters2=6)
    mesh = make_mesh(n_dev)
    sharded = sharded_local_bundle_adjust(mesh, iters1=4, iters2=6)(
        *args, fx, fy, cx, cy, bf)

    np.testing.assert_allclose(np.asarray(sharded.R),
                               np.asarray(single.R), atol=2e-4)
    np.testing.assert_allclose(np.asarray(sharded.t),
                               np.asarray(single.t), atol=2e-3)
    perr_s = np.linalg.norm(np.asarray(sharded.points) - pts_gt, axis=1)
    perr_1 = np.linalg.norm(np.asarray(single.points) - pts_gt, axis=1)
    assert np.median(perr_s) < 0.05
    assert abs(np.median(perr_s) - np.median(perr_1)) < 0.01
    # inlier classification identical up to numeric jitter
    agree = (np.asarray(sharded.edge_inlier) == np.asarray(single.edge_inlier))
    assert agree.mean() > 0.98

    # the sharded map-scale CG solver agrees too
    from airdos_tpu.parallel.sharded_ba import sharded_global_bundle_adjust
    from airdos_tpu.solvers.global_ba import global_bundle_adjust
    g1 = global_bundle_adjust(*args, fx, fy, cx, cy, bf,
                              iters1=3, iters2=4, cg_iters=32)
    gs = sharded_global_bundle_adjust(mesh, iters1=3, iters2=4,
                                      cg_iters=32)(*args, fx, fy, cx, cy, bf)
    np.testing.assert_allclose(np.asarray(gs.t), np.asarray(g1.t), atol=2e-3)
    p_g = np.linalg.norm(np.asarray(gs.points) - pts_gt, axis=1)
    assert np.median(p_g) < 0.05


def test_sharded_human_ba_matches_single_chip(rng):
    """Dynamic human-trajectory BA with the static edge table sharded over
    the mesh agrees with the single-chip solver (cameras, joints, limb
    lengths, motion, and all inlier families)."""
    from airdos_tpu.parallel.sharded_ba import sharded_human_bundle_adjust
    from airdos_tpu.solvers.human_ba import human_bundle_adjust, N_PARTS
    from test_human_ba import build_problem

    n_dev = len(jax.devices())
    pr = build_problem(rng, obs_noise=0.2)
    T, L, P, Es = pr["T"], pr["L"], pr["P"], pr["Es"]
    assert Es % n_dev == 0, Es
    ones = np.ones((T, L, N_PARTS), bool)
    pts0 = pr["pts_gt"] + rng.normal(0, 0.05, (P, 3)).astype(np.float32)
    args = (
        jnp.asarray(pr["cam_R"]), jnp.asarray(pr["cam_t"]),
        jnp.asarray(pr["cam_fixed"]),
        jnp.asarray(pts0), jnp.ones(P, bool),
        jnp.asarray(pr["es_cam"]), jnp.asarray(pr["es_pt"]),
        jnp.asarray(pr["es_obs"]),
        jnp.ones(Es, jnp.float32), jnp.ones(Es, bool),
        jnp.asarray(pr["joints0"]), jnp.asarray(ones),
        jnp.asarray(pr["jo_cam"]), jnp.asarray(pr["jo_obs"]),
        jnp.asarray(ones),
        jnp.asarray(pr["seg0"]), jnp.ones((T, N_PARTS), bool),
        jnp.asarray(ones),
        jnp.tile(jnp.eye(3, dtype=jnp.float32), (T, 1, 1)),
        jnp.zeros((T, 3), jnp.float32), jnp.ones(T, bool),
        jnp.asarray(pr["pose_dt"]),
        jnp.ones((T, L, 5), bool),
        1.0, 0.5, 20.0, 20.0,
        1.0, 4.0, 1.0,
        pr["fx"], pr["fy"], pr["cx"], pr["cy"], pr["bf"])

    single = human_bundle_adjust(*args, iters1=4, iters2=6)
    sharded = sharded_human_bundle_adjust(make_mesh(n_dev), iters1=4,
                                          iters2=6)(*args)

    np.testing.assert_allclose(np.asarray(sharded.cam_t),
                               np.asarray(single.cam_t), atol=2e-3)
    np.testing.assert_allclose(np.asarray(sharded.cam_R),
                               np.asarray(single.cam_R), atol=2e-4)
    # joint positions and limb lengths agree and recover ground truth
    jerr_s = np.linalg.norm(np.asarray(sharded.joints) - pr["joints_gt"],
                            axis=-1)
    jerr_1 = np.linalg.norm(np.asarray(single.joints) - pr["joints_gt"],
                            axis=-1)
    assert np.median(jerr_s) < 0.12
    assert abs(np.median(jerr_s) - np.median(jerr_1)) < 0.01
    np.testing.assert_allclose(np.asarray(sharded.seg_len),
                               np.asarray(single.seg_len), atol=5e-3)
    np.testing.assert_allclose(np.asarray(sharded.mot_t),
                               np.asarray(single.mot_t), atol=5e-3)
    agree = (np.asarray(sharded.static_inlier) ==
             np.asarray(single.static_inlier))
    assert agree.mean() > 0.98
    np.testing.assert_array_equal(np.asarray(sharded.key_inlier),
                                  np.asarray(single.key_inlier))


def test_human_ba_driver_pads_edges_to_mesh_multiple(rng):
    """HumanLocalBA with an edge budget NOT divisible by the mesh size
    must pad the static edge table up to a mesh multiple and still take
    the sharded path (no silent single-chip fallback), and the padded
    sharded solve agrees with the single-chip solve on the unpadded
    problem (pad rows are es_valid=False)."""
    from airdos_tpu.config import SlamConfig
    from airdos_tpu.io.synthetic import small_camera
    from airdos_tpu.parallel.sharded_ba import sharded_human_bundle_adjust
    from airdos_tpu.slam.ba_driver import HumanLocalBA
    from airdos_tpu.slam.map import SlamMap
    from airdos_tpu.solvers.human_ba import human_bundle_adjust, N_PARTS
    from test_human_ba import build_problem

    n_dev = len(jax.devices())

    class _Ext:
        sigma2 = np.asarray([1.2 ** (2 * i) for i in range(4)], np.float32)

    cfg = SlamConfig()
    cfg.camera = small_camera()
    cfg.device.n_chips = n_dev
    cfg.device.max_ba_edges = 1001          # not divisible by 8
    drv = HumanLocalBA(cfg, SlamMap(), _Ext())
    assert drv.E % n_dev == 0 and drv.E >= 1001
    # the sharded path is installed, not the single-chip fallback
    assert "sharded" in repr(getattr(drv._jit, "__wrapped__", drv._jit))

    # padded sharded solve == single-chip solve on the unpadded problem
    pr = build_problem(rng, obs_noise=0.2)
    T, L, P, Es = pr["T"], pr["L"], pr["P"], pr["Es"]
    pad = (-Es) % n_dev + n_dev             # force real padding rows
    Ep = Es + pad
    ones = np.ones((T, L, N_PARTS), bool)
    pts0 = pr["pts_gt"] + rng.normal(0, 0.05, (P, 3)).astype(np.float32)

    def args(E):
        es_cam = np.zeros(E, np.int32)
        es_pt = np.zeros(E, np.int32)
        es_obs = np.full((E, 3), -1.0, np.float32)
        es_valid = np.zeros(E, bool)
        es_cam[:Es] = pr["es_cam"]
        es_pt[:Es] = pr["es_pt"]
        es_obs[:Es] = pr["es_obs"]
        es_valid[:Es] = True
        return (
            jnp.asarray(pr["cam_R"]), jnp.asarray(pr["cam_t"]),
            jnp.asarray(pr["cam_fixed"]),
            jnp.asarray(pts0), jnp.ones(P, bool),
            jnp.asarray(es_cam), jnp.asarray(es_pt), jnp.asarray(es_obs),
            jnp.ones(E, jnp.float32), jnp.asarray(es_valid),
            jnp.asarray(pr["joints0"]), jnp.asarray(ones),
            jnp.asarray(pr["jo_cam"]), jnp.asarray(pr["jo_obs"]),
            jnp.asarray(ones),
            jnp.asarray(pr["seg0"]), jnp.ones((T, N_PARTS), bool),
            jnp.asarray(ones),
            jnp.tile(jnp.eye(3, dtype=jnp.float32), (T, 1, 1)),
            jnp.zeros((T, 3), jnp.float32), jnp.ones(T, bool),
            jnp.asarray(pr["pose_dt"]),
            jnp.ones((T, L, 5), bool),
            1.0, 0.5, 20.0, 20.0,
            1.0, 4.0, 1.0,
            pr["fx"], pr["fy"], pr["cx"], pr["cy"], pr["bf"])

    single = human_bundle_adjust(*args(Es), iters1=4, iters2=6)
    sharded = sharded_human_bundle_adjust(make_mesh(n_dev), iters1=4,
                                          iters2=6)(*args(Ep))
    np.testing.assert_allclose(np.asarray(sharded.cam_t),
                               np.asarray(single.cam_t), atol=2e-3)
    np.testing.assert_allclose(np.asarray(sharded.joints),
                               np.asarray(single.joints), atol=5e-3)
    np.testing.assert_allclose(np.asarray(sharded.seg_len),
                               np.asarray(single.seg_len), atol=5e-3)


def test_system_runs_with_sharded_ba_drivers():
    """Full System with device.n_chips=8: the tracking + mapping pipeline
    drives the SHARDED local-BA path (ba_driver gating on n_chips) over
    the virtual mesh, end to end on real frames."""
    from airdos_tpu.config import SlamConfig
    from airdos_tpu.io.synthetic import SyntheticStereoWorld, small_camera
    from airdos_tpu.io.tum import ate_rmse
    from airdos_tpu.slam.system import System

    cfg = SlamConfig()
    cfg.camera = small_camera()
    cfg.orb.n_features = 600
    cfg.orb.n_levels = 4
    cfg.human.ok = False
    cfg.system.is_offline = True
    cfg.device.max_keypoints = 1024
    cfg.device.max_local_kfs = 8
    cfg.device.max_fixed_kfs = 4
    cfg.device.max_local_points = 1024
    cfg.device.max_ba_edges = 4096
    cfg.device.n_chips = len(jax.devices())
    assert cfg.device.n_chips == 8

    world = SyntheticStereoWorld(seed=0, n_points=200, cam=cfg.camera)
    slam = System(cfg)
    gt = []
    for data, Rwc, twc in world.sequence(8, dt=0.1, yaw_rate=0.008):
        slam.track_stereo(data)
        gt.append(twc)
    assert slam.tracking.state.name == "OK"
    assert slam.map.n_keyframes() >= 2
    ts, _, twc_e = slam.tracking.trajectory_tum()
    assert float(ate_rmse(twc_e, np.asarray(gt)[: len(twc_e)])) < 0.1
    slam.shutdown()


def test_sharded_sim3_ransac_matches_single_chip(rng):
    """Hypothesis-parallel Sim3 RANSAC over the mesh returns the same
    transform and inlier set as the single-chip solver for the same sample
    table (loop closure's ComputeSim3 scaling axis)."""
    from airdos_tpu.geometry.se3 import so3_exp
    from airdos_tpu.parallel.sharded_ba import sharded_sim3_ransac
    from airdos_tpu.solvers.sim3 import sim3_ransac

    n_dev = len(jax.devices())
    fx = fy = 400.0
    cx, cy = 160.0, 120.0
    n = 50
    x2 = rng.uniform([-3, -2, 4], [3, 2, 15], (n, 3)).astype(np.float32)
    R_gt = np.asarray(so3_exp(jnp.asarray([0.05, 0.3, -0.1])))
    t_gt = np.array([0.5, -0.2, 0.8], np.float32)
    x1 = ((R_gt @ x2.T).T + t_gt).astype(np.float32)
    x1 += rng.normal(0, 0.01, x1.shape).astype(np.float32)
    out = rng.choice(n, 10, replace=False)
    x1[out] += rng.uniform(1, 3, (10, 3)).astype(np.float32)
    H = 128
    assert H % n_dev == 0
    samples = rng.integers(0, n, (H, 3)).astype(np.int32)
    err1 = jnp.full(n, 9.21 * 4, jnp.float32)
    err2 = jnp.full(n, 9.21 * 4, jnp.float32)

    single = sim3_ransac(jnp.asarray(x1), jnp.asarray(x2),
                         jnp.ones(n, bool), jnp.asarray(samples),
                         err1, err2, fx, fy, cx, cy, fix_scale=True)
    sharded = sharded_sim3_ransac(make_mesh(n_dev), fix_scale=True)(
        jnp.asarray(x1), jnp.asarray(x2), jnp.ones(n, bool),
        jnp.asarray(samples), err1, err2, fx, fy, cx, cy)

    assert int(single.n_inliers) >= 35
    assert int(sharded.n_inliers) == int(single.n_inliers)
    np.testing.assert_allclose(np.asarray(sharded.R), np.asarray(single.R),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(sharded.t), np.asarray(single.t),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(sharded.inliers),
                                  np.asarray(single.inliers))


def test_sharded_pnp_ransac_matches_single_chip(rng):
    """Hypothesis-parallel EPnP RANSAC over the mesh returns the same pose
    and inlier set as the single-chip solver for the same sample table."""
    from airdos_tpu.parallel.sharded_ba import sharded_epnp_ransac
    from airdos_tpu.solvers.epnp import epnp_ransac
    from airdos_tpu.geometry.se3 import so3_exp

    n_dev = len(jax.devices())
    fx = fy = 320.0
    cx, cy = 160.0, 120.0
    n = 80
    pw = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                   rng.uniform(4, 15, n)], axis=1).astype(np.float32)
    R_gt = np.asarray(so3_exp(jnp.asarray(
        np.asarray([0.05, -0.1, 0.03], np.float32))))
    t_gt = np.asarray([0.2, -0.1, 0.4], np.float32)
    xc = pw @ R_gt.T + t_gt
    uv = np.stack([fx * xc[:, 0] / xc[:, 2] + cx,
                   fy * xc[:, 1] / xc[:, 2] + cy],
                  axis=1).astype(np.float32)
    uv += rng.normal(0, 0.3, uv.shape).astype(np.float32)
    # 25% outliers
    out = rng.permutation(n)[: n // 4]
    uv[out] += rng.uniform(20, 60, (len(out), 2)).astype(np.float32)
    max_err2 = np.full(n, 5.991, np.float32)
    H = 256
    assert H % n_dev == 0
    samples = rng.integers(0, n, (H, 4)).astype(np.int32)

    args = (jnp.asarray(pw), jnp.asarray(uv), jnp.ones(n, bool),
            jnp.asarray(max_err2), jnp.asarray(samples),
            fx, fy, cx, cy)
    single = epnp_ransac(*args)
    sharded = sharded_epnp_ransac(make_mesh(n_dev))(*args)
    assert int(single.n_inliers) > 0.6 * n
    assert int(sharded.n_inliers) == int(single.n_inliers)
    np.testing.assert_allclose(np.asarray(sharded.R), np.asarray(single.R),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(sharded.t), np.asarray(single.t),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(sharded.inliers),
                                  np.asarray(single.inliers))
