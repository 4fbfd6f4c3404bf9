"""Config ingestion + trajectory/dataset I/O tests."""
import numpy as np
import pytest
from pathlib import Path

from airdos_tpu.config import SlamConfig
from airdos_tpu.io.tum import (ate_rmse, read_trajectory_tum,
                               write_trajectory_kitti, write_trajectory_tum)
from airdos_tpu.io.datasets import (read_alphapose_file, read_number_txt,
                                    read_track_ids)


def test_from_yaml_reference_schema():
    cfg = SlamConfig.from_yaml(Path(__file__).parent.parent /
                               "examples/config/tartanair.yaml")
    assert abs(cfg.camera.fx - 772.5483399593904) < 1e-9
    assert cfg.camera.width == 640 and cfg.camera.height == 360
    assert abs(cfg.camera.bf - 193.1370849898476) < 1e-9
    assert cfg.orb.n_features == 1500
    assert cfg.orb.n_levels == 8
    assert cfg.orb.ini_th_fast == 12 and cfg.orb.min_th_fast == 7
    assert cfg.system.is_offline and cfg.system.is_mask
    assert cfg.human.ok and cfg.human.is_seg
    assert cfg.optimizer.sigma_human == 0.5
    assert cfg.optimizer.sigma_motion == 20
    assert cfg.optimizer.th_ransac_rigidity == 1
    assert cfg.scheduler.n_end_image == 100
    assert abs(cfg.th_depth_m - 193.1370849898476 * 30 / 772.5483399593904) < 1e-6
    assert abs(cfg.camera.baseline - 0.25) < 1e-6


def test_tum_roundtrip(tmp_path, rng):
    from scipy.spatial.transform import Rotation as R
    n = 20
    ts = np.arange(n) * 0.5
    Rwc = R.from_rotvec(rng.normal(0, 0.3, (n, 3))).as_matrix()
    twc = rng.normal(0, 2, (n, 3))
    p = tmp_path / "t.txt"
    write_trajectory_tum(p, ts, Rwc, twc)
    ts2, R2, t2 = read_trajectory_tum(p)
    np.testing.assert_allclose(ts2, ts, atol=1e-6)
    np.testing.assert_allclose(R2, Rwc, atol=1e-5)
    np.testing.assert_allclose(t2, twc, atol=1e-6)
    # 8 columns exactly
    cols = p.read_text().splitlines()[0].split()
    assert len(cols) == 8


def test_kitti_format(tmp_path, rng):
    Rwc = np.tile(np.eye(3), (3, 1, 1))
    twc = rng.normal(0, 1, (3, 3))
    p = tmp_path / "k.txt"
    write_trajectory_kitti(p, Rwc, twc)
    rows = np.loadtxt(p)
    assert rows.shape == (3, 12)
    np.testing.assert_allclose(rows[0].reshape(3, 4)[:, 3], twc[0], atol=1e-6)


def test_alphapose_readers(tmp_path, rng):
    # 54-column format: 18 joints x (x, y, score)
    humans = rng.uniform(0, 100, (2, 54))
    f = tmp_path / "000000.txt"
    np.savetxt(f, humans)
    out = read_alphapose_file(f)
    assert out.shape == (2, 18, 3)
    np.testing.assert_allclose(out.reshape(2, 54), humans)
    # missing file -> empty (reference recovery semantics)
    assert read_alphapose_file(tmp_path / "missing.txt").shape == (0, 18, 3)

    tid = tmp_path / "track.txt"
    tid.write_text("3\n-1\n7\n")
    ids = read_track_ids(tid)
    assert ids.tolist() == [3, -1, 7]


def test_ate_rmse_alignment(rng):
    gt = rng.normal(0, 3, (30, 3))
    # rigidly transformed estimate should align to ~0 error
    from scipy.spatial.transform import Rotation as R
    Rr = R.from_rotvec([0.2, -0.1, 0.4]).as_matrix()
    est = (Rr @ gt.T).T + np.array([5.0, -2.0, 1.0])
    assert ate_rmse(est, gt) < 1e-6
    assert ate_rmse(est + rng.normal(0, 0.1, est.shape), gt) > 0.05


def test_rpe_known_perturbation(rng):
    """RPE (evo --delta 1 --all_pairs semantics, Evaluation/evaluate.py:32-35)
    on a trajectory with a known constant relative-pose error."""
    from scipy.spatial.transform import Rotation
    from airdos_tpu.io.tum import rpe
    n = 20
    ts = np.arange(n, dtype=np.float64)
    gt_R = np.tile(np.eye(3), (n, 1, 1))
    gt_t = np.stack([np.array([0.3 * i, 0.0, 0.1 * i]) for i in range(n)])

    # identical trajectories -> zero error
    t_err, r_err = rpe(ts, gt_R, gt_t, gt_R, gt_t, delta=1)
    assert abs(t_err) < 1e-9 and abs(r_err) < 1e-6

    # constant 2 cm slip per step -> exactly 0.02 m translation RPE
    est_t = gt_t + np.array([0.02, 0.0, 0.0]) * np.arange(n)[:, None]
    t_err, r_err = rpe(ts, gt_R, est_t, gt_R, gt_t, delta=1)
    assert abs(t_err - 0.02) < 1e-9, t_err
    assert abs(r_err) < 1e-6

    # constant 1-degree rotation drift per step -> exactly 1 deg rot RPE
    dR = Rotation.from_euler("z", 1.0, degrees=True).as_matrix()
    est_R = gt_R.copy()
    acc = np.eye(3)
    for i in range(n):
        est_R[i] = acc.copy()
        acc = acc @ dR
    t_err, r_err = rpe(ts, est_R, gt_t, gt_R, gt_t, delta=1)
    assert abs(r_err - 1.0) < 1e-6, r_err


def test_builtin_metrics_agree_with_evo(tmp_path, rng):
    """When evo is importable, tools/evaluate.evo_metrics and the builtin
    ATE/RPE must agree on the same trajectory pair (the north-star
    acceptance is evo-compatibility; skipped where evo is absent)."""
    pytest.importorskip("evo")
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from evaluate import evo_metrics
    from scipy.spatial.transform import Rotation as R

    n = 40
    ts = np.arange(n) * 0.5
    gt_R = R.from_rotvec(rng.normal(0, 0.05, (n, 3))).as_matrix()
    gt_t = np.cumsum(rng.normal(0, 0.1, (n, 3)), axis=0)
    est_t = gt_t + rng.normal(0, 0.01, (n, 3))
    p_gt = tmp_path / "gt.txt"
    p_est = tmp_path / "est.txt"
    write_trajectory_tum(p_gt, ts, gt_R, gt_t)
    write_trajectory_tum(p_est, ts, gt_R, est_t)

    ate_evo, rpe_t_evo, rpe_r_evo = evo_metrics(str(p_est), str(p_gt))
    ts_e, R_e, t_e = read_trajectory_tum(p_est)
    ts_g, R_g, t_g = read_trajectory_tum(p_gt)
    ate_b = ate_rmse(t_e, t_g)
    rpe_t_b, rpe_r_b = rpe(ts_e, R_e, t_e, R_g, t_g, delta=1)
    assert abs(ate_evo - ate_b) < 0.1 * max(ate_b, 1e-6)
    assert abs(rpe_t_evo - rpe_t_b) < 0.1 * max(rpe_t_b, 1e-6)
