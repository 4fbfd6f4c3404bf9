"""End-to-end system tests on the synthetic stereo world (small camera for
CPU speed; the full TartanAir-geometry run is the benchmark's job)."""
import numpy as np
import jax.numpy as jnp
import pytest

from airdos_tpu.config import SlamConfig
from airdos_tpu.io.synthetic import SyntheticStereoWorld, small_camera
from airdos_tpu.io.tum import ate_rmse, read_trajectory_tum
from airdos_tpu.slam.system import System
from airdos_tpu.slam.map import TH_LONG_TRAJECTORY


def small_config(**kw):
    cfg = SlamConfig()
    cfg.camera = small_camera()
    cfg.orb.n_features = 600
    cfg.orb.n_levels = 4
    cfg.human.ok = False
    cfg.device.max_keypoints = 1024
    cfg.device.max_local_kfs = 8
    cfg.device.max_fixed_kfs = 4
    cfg.device.max_local_points = 1024
    cfg.device.max_ba_edges = 4096
    cfg.device.max_trajectories = 2
    cfg.device.max_trajectory_len = 16
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


@pytest.fixture(scope="module")
def vo_frames():
    """Rendered 14-frame sequence shared by the static-VO module tests
    (rendering dominates e2e test cost on the 1-core CI box)."""
    cfg = small_config()
    world = SyntheticStereoWorld(seed=0, n_points=200, cam=cfg.camera)
    return [(data, Rwc, twc)
            for data, Rwc, twc in world.sequence(14, dt=0.1, yaw_rate=0.008)]


def test_vo_tracks_and_exports_trajectory(tmp_path, vo_frames):
    cfg = small_config()
    slam = System(cfg)
    gt = []
    for data, Rwc, twc in vo_frames:
        slam.track_stereo(data)
        gt.append(twc)
    assert slam.tracking.state.name == "OK"
    assert slam.map.n_keyframes() >= 2
    assert slam.map.n_points() > 100

    out = tmp_path / "traj.txt"
    slam.save_trajectory_tum(out)
    ts, Rwc_est, twc_est = read_trajectory_tum(out)
    assert len(ts) >= 14
    # the low-res camera drifts; just require a sane bound and full tracking
    err = ate_rmse(twc_est, np.asarray(gt)[:len(twc_est)])
    assert err < 2.0, err
    slam.before_end(tmp_path / "dump")
    assert (tmp_path / "dump" / "KF.txt").exists()
    assert (tmp_path / "dump" / "MP.txt").exists()
    assert (tmp_path / "dump" / "Match.txt").exists()
    slam.shutdown()


def test_online_mode_matches_reference_threading(vo_frames):
    cfg = small_config()
    cfg.system.is_offline = False
    slam = System(cfg)
    for data, _, _ in vo_frames[:12]:
        slam.track_stereo(data)
    slam.shutdown()
    assert slam.tracking.state.name == "OK"
    assert slam.map.n_keyframes() >= 2


@pytest.mark.slow
def test_human_pipeline_builds_trajectories():
    cfg = small_config()
    cfg.human.ok = True
    cfg.human.is_seg = True
    cfg.system.is_mask = True
    world = SyntheticStereoWorld(seed=3, n_points=200, cam=cfg.camera,
                                 n_humans=2)
    slam = System(cfg)
    for data, Rwc, twc in world.sequence(14, dt=0.1, yaw_rate=0.008):
        slam.track_stereo_human(data)
    trajs = slam.map.trajectories
    assert len(trajs) >= 1
    long_trajs = [t for t in trajs.values() if len(t) > TH_LONG_TRAJECTORY]
    assert long_trajs, [len(t) for t in trajs.values()]
    # human BA ran and optimized at least one trajectory
    assert any(t.optimized for t in long_trajs)
    t0 = long_trajs[0]
    gt_vel = world.humans[t0.track_id].velocity
    est_vel = t0.motion_t
    # lateral velocity is well constrained; depth-axis velocity sits at the
    # stereo depth-noise floor (sigma_z ~ z^2 sigma_d / bf ~ 0.4 m here)
    assert abs(est_vel[0] - gt_vel[0]) < 0.35, (est_vel, gt_vel)
    assert np.linalg.norm(est_vel - gt_vel) < 1.0, (est_vel, gt_vel)
    # segment lengths close to the rest-skeleton lengths where optimized
    from airdos_tpu.io.synthetic import _SKELETON_REST, BODY1, BODY2
    seg_gt = np.linalg.norm(_SKELETON_REST[BODY1] - _SKELETON_REST[BODY2], axis=1)
    opt = t0.segment_optimized & ~t0.segment_bad
    if opt.any():
        err = np.abs(t0.segment_len[opt] - seg_gt[opt])
        assert np.median(err) < 0.15, (t0.segment_len, seg_gt)
    slam.shutdown()


def test_reference_exact_preset_tracks(vo_frames):
    """The drop-in-exact preset (velocity_damping=1.0 raw constant-velocity
    extrapolation, Tracking.cc:466-469; thRefRatio keyframe schedule,
    Tracking.cc:1091) must still track a real sequence end-to-end — guards
    the preset against rot (VERDICT r4 #9)."""
    cfg = small_config().reference_exact()
    assert cfg.optimizer.velocity_damping == 1.0
    assert cfg.optimizer.kf_ref_schedule == "reference"
    slam = System(cfg)
    gt = []
    for data, Rwc, twc in vo_frames:
        slam.track_stereo(data)
        gt.append(twc)
    assert slam.tracking.state.name == "OK"
    assert slam.map.n_keyframes() >= 2
    ts, _, twc_e = slam.tracking.trajectory_tum()
    err = ate_rmse(twc_e, np.asarray(gt)[: len(twc_e)])
    assert err < 2.0, err
    slam.shutdown()


def test_reset_on_early_loss(vo_frames):
    """Feeding garbage after init must reset and re-initialize cleanly."""
    cfg = small_config()
    slam = System(cfg)
    rng = np.random.default_rng(0)
    frames = vo_frames[:6]
    for data, _, _ in frames[:3]:
        slam.track_stereo(data)
    # garbage frames -> loss -> reset
    from airdos_tpu.io.datasets import FrameData
    noise = FrameData(timestamp=99.0, index=99,
                      image_left=rng.uniform(0, 255, data.image_left.shape).astype(np.float32),
                      image_right=rng.uniform(0, 255, data.image_right.shape).astype(np.float32))
    slam.track_stereo(noise)
    assert slam.tracking.state.name in ("LOST", "NOT_INITIALIZED")
    # feeding good frames again re-initializes
    for data, _, _ in frames[3:]:
        slam.track_stereo(data)
    assert slam.tracking.state.name == "OK"
    slam.shutdown()
