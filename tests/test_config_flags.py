"""Config-flag behaviors: IsKeyFrameOnly, IsGroundTruthDepth, fast human
BA, localization-only mode."""
import numpy as np
import pytest

from airdos_tpu.config import SlamConfig
from airdos_tpu.io.datasets import FrameData
from airdos_tpu.io.synthetic import SyntheticStereoWorld, small_camera
from airdos_tpu.slam.system import System


def small_config(**kw):
    cfg = SlamConfig()
    cfg.camera = small_camera()
    cfg.orb.n_features = 600
    cfg.orb.n_levels = 4
    cfg.device.max_keypoints = 1024
    cfg.device.max_local_kfs = 8
    cfg.device.max_fixed_kfs = 4
    cfg.device.max_local_points = 1024
    cfg.device.max_ba_edges = 4096
    cfg.device.max_trajectories = 2
    cfg.device.max_trajectory_len = 16
    return cfg


def _human_world(cfg):
    return SyntheticStereoWorld(seed=3, n_points=200, cam=cfg.camera,
                                n_humans=1)


def test_reference_exact_preset():
    """SlamConfig.reference_exact(): every reasoned deviation switched
    back to the reference's behavior (raw velocity extrapolation,
    Tracking.cc:466-469; thRefRatio schedule, Tracking.cc:1091), without
    mutating the original config."""
    cfg = small_config()
    ref = cfg.reference_exact()
    assert ref.optimizer.velocity_damping == 1.0
    assert ref.optimizer.kf_ref_schedule == "reference"
    assert cfg.optimizer.velocity_damping == 0.7
    assert cfg.optimizer.kf_ref_schedule == "stereo_sharp"
    # unrelated fields survive the copy
    assert ref.camera.fx == cfg.camera.fx
    assert ref.orb.n_features == cfg.orb.n_features


def test_public_reset_restarts_tracking():
    """System.reset() (reference System::Reset handshake, System.cc:308-311
    -> Tracking::Reset, Tracking.cc:1656-1705): the map empties, tracking
    reinitializes on the next frame, and the system keeps working."""
    cfg = small_config()
    world = SyntheticStereoWorld(seed=0, n_points=200, cam=cfg.camera)
    frames = [(d, R, t) for d, R, t in world.sequence(10, dt=0.1,
                                                      yaw_rate=0.008)]
    slam = System(cfg)
    for d, _, _ in frames[:6]:
        slam.track_stereo(d)
    assert slam.map.n_keyframes() >= 1
    slam.reset()
    assert slam.map.n_keyframes() == 0
    assert slam.tracking.state.name == "NOT_INITIALIZED"
    assert slam.tracking.records == []
    for d, _, _ in frames[6:]:
        slam.track_stereo(d)
    assert slam.tracking.state.name == "OK"
    assert slam.map.n_keyframes() >= 1
    slam.shutdown()


def test_camera_rgb_color_conversion():
    """Camera.RGB channel-order handling (reference Tracking.cc:247-272):
    3-channel input is converted with the right weights for RGB vs BGR."""
    cfg = small_config()
    slam = System(cfg)
    img = np.zeros((4, 4, 3), np.float32)
    img[..., 0] = 100.0           # channel 0 dominant
    cfg.camera.rgb = 1            # RGB: channel 0 is red (w=0.299)
    g_rgb = slam._to_gray(img)
    cfg.camera.rgb = 0            # BGR: channel 0 is blue (w=0.114)
    g_bgr = slam._to_gray(img)
    assert abs(float(g_rgb[0, 0]) - 29.9) < 1e-3
    assert abs(float(g_bgr[0, 0]) - 11.4) < 1e-3
    # grayscale passes through untouched
    g2 = slam._to_gray(np.full((4, 4), 7.0, np.float32))
    assert (g2 == 7.0).all()
    slam.shutdown()


@pytest.mark.slow
def test_keyframe_only_limits_human_poses():
    """IsKeyFrameOnly=1: human poses enter only on keyframes (reference
    Tracking.cc:493 'else if(!mbIsKeyFrameOnly) GrabHumanPose()')."""
    counts = {}
    for kf_only in (False, True):
        cfg = small_config()
        cfg.human.ok = True
        cfg.optimizer.is_keyframe_only = kf_only
        world = _human_world(cfg)
        slam = System(cfg)
        for data, _, _ in world.sequence(10, dt=0.1, yaw_rate=0.008):
            slam.track_stereo_human(data)
        counts[kf_only] = sum(len(t) for t in slam.map.trajectories.values())
        slam.shutdown()
    assert counts[True] < counts[False]
    assert counts[True] >= 1


def test_ground_truth_depth_human_path():
    """System.IsGroundTruthDepth=1 + a depth image: joint depths come from
    the depth map (reference Frame::ComputeHumanPoseDepth, Frame.cc:249-311)
    instead of stereo triangulation."""
    cfg = small_config()
    cfg.human.ok = True
    cfg.system.is_ground_truth_depth = True
    world = _human_world(cfg)
    slam = System(cfg)
    seen = 0
    Rwc, twc = world.trajectory(6, 0.1)
    for i in range(6):
        data = world.frame(i, Rwc[i], twc[i], i * 0.1, with_depth=True)
        assert data.depth is not None
        frame = slam.track_stereo_human(data)
        for obs in frame.humans:
            seen += 1
            # depth must equal the depth-map reads at the joints
            for j in range(0, 18, 4):
                u, v = obs.kp_left[j]
                ui = int(np.clip(u, 0, data.depth.shape[1] - 1))
                vi = int(np.clip(v, 0, data.depth.shape[0] - 1))
                d = max(float(data.depth[vi, ui]), 0.01)
                assert abs(obs.depth[j] - d) < 1e-4
    assert seen > 0
    slam.shutdown()


@pytest.mark.slow
def test_fast_human_ba_uses_whole_trajectory():
    """use_fast_human_ba: every pose of an observed trajectory enters the
    BA window (Fast variant, Optimizer.cc:736-1493)."""
    for fast in (False, True):
        cfg = small_config()
        cfg.human.ok = True
        cfg.optimizer.use_fast_human_ba = fast
        world = _human_world(cfg)
        slam = System(cfg)
        for data, _, _ in world.sequence(16, dt=0.1, yaw_rate=0.008):
            slam.track_stereo_human(data)
        trajs = [t for t in slam.map.trajectories.values() if t.optimized]
        if fast:
            assert trajs, "fast variant should have optimized a trajectory"
            # all (windowed-cap) poses marked optimized, not only ones
            # anchored to window KFs
            t0 = trajs[0]
            n_opt = sum(bool(hp.optimized.any()) for hp in t0.poses)
            # poses appended after the last BA call (cadence: every
            # Camera.fps frames) are not yet marked — require a clear
            # majority, which the windowed variant doesn't reach
            assert n_opt >= min(len(t0), cfg.device.max_trajectory_len) * 0.6
        slam.shutdown()


@pytest.mark.slow
def test_localization_only_mode():
    """ActivateLocalizationMode freezes the map (System.cc:288-296)."""
    cfg = small_config()
    cfg.human.ok = False
    world = SyntheticStereoWorld(seed=0, n_points=200, cam=cfg.camera)
    slam = System(cfg)
    frames = list(world.sequence(14, dt=0.1, yaw_rate=0.008))
    for data, _, _ in frames[:8]:
        slam.track_stereo(data)
    n_kfs = slam.map.n_keyframes()
    n_pts = slam.map.n_points()
    assert slam.tracking.state.name == "OK"
    slam.activate_localization_mode()
    for data, _, twc in frames[8:]:
        frame = slam.track_stereo(data)
    assert slam.tracking.state.name == "OK"
    assert slam.map.n_keyframes() == n_kfs      # no new keyframes
    assert slam.map.n_points() == n_pts         # map frozen
    err = np.linalg.norm(frame.Ow - frames[-1][2])
    assert err < 0.5, err
    slam.deactivate_localization_mode()
    slam.shutdown()
