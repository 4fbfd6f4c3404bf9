"""Online mode + human pipeline: the mapping worker and the background
human-trajectory BA run CONCURRENTLY with tracking, under the shared map
lock (VERDICT r4 #2).

The reference never exercises this combination — human BA is disabled in
its online LocalMapping thread (LocalMapping.cc:88-93) and only the
offline OffLineTrack path calls it (Tracking.cc:705-717) — but every
reference optimizer runs under Map::mMutexMapUpdate (Map.h:136).  This
rebuild supports online+human by giving HumanLocalBA the StaticLocalBA
lock discipline (lock for assembly + write-back, release during the
device solve) and running the solve in a background thread so tracking
never blocks on it.  This test drives ≥50 frames of the flagship crowd
world through that combination and asserts it is crash-free, that the
human BA genuinely ran in the background, and that accuracy holds."""
import numpy as np
import pytest

from airdos_tpu.config import SlamConfig
from airdos_tpu.io.synthetic import SyntheticStereoWorld, default_camera
from airdos_tpu.io.tum import ate_rmse
from airdos_tpu.slam.system import System


@pytest.mark.slow
def test_online_human_ba_runs_concurrently_with_mapping():
    cfg = SlamConfig()
    cfg.camera = default_camera()
    cfg.camera.fps = 5.0
    cfg.orb.n_features = 1000
    cfg.orb.n_levels = 8
    cfg.human.ok = True
    cfg.human.is_seg = True
    cfg.system.is_mask = True
    cfg.optimizer.is_static_only = False
    cfg.system.is_offline = False        # mapping worker thread ON
    cfg.device.max_keypoints = 2048
    cfg.device.max_local_kfs = 8
    cfg.device.max_fixed_kfs = 4
    cfg.device.max_local_points = 2048
    cfg.device.max_ba_edges = 8192
    cfg.device.max_trajectories = 8
    cfg.device.max_trajectory_len = 8

    n_total = 50
    world = SyntheticStereoWorld(seed=2, n_points=500, n_humans=10,
                                 crowd=True)
    Rwc, twc = world.trajectory(n_total, 0.1, yaw_rate=0.005)

    slam = System(cfg)
    for i in range(n_total):
        f = world.frame(i, Rwc[i], twc[i], i * 0.1, with_humans=True)
        slam.track_stereo_human(f)
    assert slam.tracking.state.name == "OK"

    # drain the background human BA and mapping worker; join() re-raises
    # any exception the BA thread hit (a race would surface here)
    slam.shutdown()

    # the human BA genuinely ran in the background (launch() path), more
    # than once, while the mapping worker was mutating the map
    assert slam.human_ba.n_runs >= 2, slam.human_ba.n_runs
    assert slam.map.optimized_track_ids, "no trajectory was optimized"
    n_opt = sum(1 for t in slam.map.trajectories.values() if t.optimized)
    assert n_opt >= 3, n_opt

    # accuracy holds over the concurrent run (same bound as the offline
    # flagship test's absolute gate, over 3.5x the horizon)
    ts, _, twc_e = slam.tracking.trajectory_tum()
    ate = float(ate_rmse(twc_e, np.asarray(twc)[: len(twc_e)]))
    assert ate < 0.03, ate
