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


def test_use_tracked_id_gates_loader(tmp_path):
    """Human.UseTrackedId gates ingestion of track_id_alpha/ per-frame ids
    (the reference parses the flag at Tracking.cc:116; without ids every
    human carries track id -1 and never forms a trajectory, the
    Frame.cc:273-275 no-trackid branch)."""
    import cv2
    from airdos_tpu.io.datasets import TartanAirStereoSequence
    root = tmp_path / "seq"
    for d in ("image_0", "image_1", "alphapose_0", "alphapose_1",
              "track_id_alpha"):
        (root / d).mkdir(parents=True)
    im = np.zeros((32, 32), np.uint8)
    cv2.imwrite(str(root / "image_0" / "000000.png"), im)
    cv2.imwrite(str(root / "image_1" / "000000.png"), im)
    pose = " ".join(["10 10 0.9"] * 18)
    (root / "alphapose_0" / "000000.txt").write_text(pose + "\n")
    (root / "alphapose_1" / "000000.txt").write_text(pose + "\n")
    (root / "track_id_alpha" / "000000.txt").write_text("7\n")
    (root / "times.txt").write_text("0.0\n")

    seq_on = TartanAirStereoSequence(root, with_masks=False,
                                     with_humans=True, use_tracked_id=True)
    assert seq_on[0].track_ids is not None
    assert int(seq_on[0].track_ids[0]) == 7
    seq_off = TartanAirStereoSequence(root, with_masks=False,
                                      with_humans=True, use_tracked_id=False)
    assert seq_off[0].track_ids is None


def test_meta_data_path_default_dump(tmp_path):
    """before_end() with no argument dumps to Data.MetaDataPath (the
    reference passes msDataFolder from that key into Tracking::SaveMap,
    Tracking.cc:180, System.cc:583-599)."""
    cfg = small_config()
    cfg.meta_data_path = str(tmp_path / "meta")
    world = SyntheticStereoWorld(seed=0, n_points=200, cam=cfg.camera)
    slam = System(cfg)
    for d, _, _ in world.sequence(6, dt=0.1, yaw_rate=0.008):
        slam.track_stereo(d)
    slam.before_end()           # no explicit dir -> Data.MetaDataPath
    slam.shutdown()
    assert (tmp_path / "meta" / "KF.txt").exists()
    assert (tmp_path / "meta" / "MP.txt").exists()


def test_ransac_hypotheses_knob():
    """Device.ransac_hypotheses sizes the vmapped relocalization RANSAC
    batch (replacing the reference's sequential maxIterations=300 loop,
    Tracking.cc:1538)."""
    import jax.numpy as jnp
    from airdos_tpu.solvers.epnp import epnp_ransac
    rng = np.random.default_rng(0)
    n = 60
    pw = np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
                   rng.uniform(3, 9, n)], 1).astype(np.float32)
    fx = fy, cx, cy = 120.0, 64.0, 48.0
    uv = np.stack([120.0 * pw[:, 0] / pw[:, 2] + 64.0,
                   120.0 * pw[:, 1] / pw[:, 2] + 48.0], 1).astype(np.float32)
    for n_hyp in (64, 128):
        samples = rng.integers(0, n, (n_hyp, 4)).astype(np.int32)
        res = epnp_ransac(jnp.asarray(pw), jnp.asarray(uv),
                          jnp.ones(n, bool),
                          jnp.full(n, 5.991, jnp.float32),
                          jnp.asarray(samples), 120.0, 120.0, 64.0, 48.0)
        assert int(res.n_inliers) >= n * 0.8
