"""Offline-mode determinism: the reference's System.IsOffline=1 exists
precisely to make runs reproducible (SURVEY §4; stereo_human.cc:53-61).
Two identical runs must produce byte-identical trajectories and SaveMap
dumps — the golden-file regression schema (Tracking::SaveMap,
Tracking.cc:1752-1835) only works if this holds."""
import numpy as np

from airdos_tpu.config import SlamConfig
from airdos_tpu.io.synthetic import SyntheticStereoWorld, small_camera
from airdos_tpu.slam.system import System


def _run(frames, tmp_path, tag):
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
    slam = System(cfg)
    for data, _, _ in frames:
        slam.track_stereo(data)
    traj = tmp_path / f"traj_{tag}.txt"
    dump = tmp_path / f"dump_{tag}"
    slam.save_trajectory_tum(traj)
    slam.before_end(dump)
    slam.shutdown()
    return traj.read_text(), {f: (dump / f).read_text()
                              for f in ("KF.txt", "MP.txt", "Match.txt")}


def test_offline_mode_is_deterministic(tmp_path):
    cfg_cam = small_camera()
    world = SyntheticStereoWorld(seed=0, n_points=200, cam=cfg_cam)
    frames = list(world.sequence(8, dt=0.1, yaw_rate=0.008))

    traj_a, dumps_a = _run(frames, tmp_path, "a")
    traj_b, dumps_b = _run(frames, tmp_path, "b")

    assert traj_a == traj_b
    for f in dumps_a:
        assert dumps_a[f] == dumps_b[f], f
