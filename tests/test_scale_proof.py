"""Global-layer scale proof: a 260-frame online run creating 200+
keyframes through the FULL pipeline — tracking, concurrent mapping worker,
image-level loop closure (two genuine revisit events), asynchronous
abortable global BA, and keyframe culling (the reference's 90% redundancy
rule, LocalMapping.cc:646-711) — with an end-state ATE assertion.

Testbed: the pillar-orbit loop world with a slow vertical helix bob whose
period is incommensurate with the lap, so every revisit sees slightly new
views and keyframe creation continues across laps (a flat multi-lap orbit
stops inserting KFs after the first loop closes — tracked inliers stay
above the c2 ratio against the existing map)."""
import numpy as np
import pytest

from airdos_tpu.config import SlamConfig
from airdos_tpu.io.synthetic import SyntheticStereoWorld, small_camera
from airdos_tpu.io.tum import ate_rmse
from airdos_tpu.slam.system import System


@pytest.mark.slow
def test_200kf_online_run_with_loops_gba_and_culling():
    cfg = SlamConfig()
    cfg.camera = small_camera()
    cfg.camera.fps = 5.0
    cfg.orb.n_features = 600
    cfg.orb.n_levels = 4
    cfg.device.max_keypoints = 1024
    cfg.device.max_local_kfs = 8
    cfg.device.max_fixed_kfs = 4
    cfg.device.max_local_points = 1024
    cfg.device.max_ba_edges = 4096
    cfg.system.is_offline = False        # mapping thread + ASYNC GBA
    cfg.enable_loop_closing = True

    world = SyntheticStereoWorld(seed=1, n_points=300, cam=cfg.camera,
                                 centered=True, world_size=(16.0, 3.0, 16.0),
                                 clear_ring=(1.35, 0.0, 1.35, 0.7),
                                 ring_outside_only=True, room_radius=4.5,
                                 pillar=(1.35, 0.0, 0.55, 8))
    N = 260
    laps = N / 84 * 1.22
    Rwc, twc = world.orbit_loop_trajectory(N, radius=1.35, laps=laps)
    twc = twc.copy()
    twc[:, 1] += 0.22 * np.sin(2 * np.pi * 0.37 * laps * np.arange(N) / N)

    slam = System(cfg)
    for i in range(N):
        data = world.frame(i, Rwc[i], twc[i], i * 0.2, with_humans=False)
        slam.track_stereo(data)
        # pace the producer like the reference's dataset-timestamp sleep
        # (stereo_human.cc:135-146): this feeder has no frame-rate cap, so
        # on a slow machine it outruns the mapping worker, the idleness
        # gate skips keyframes, and the run goes LOST for reasons that are
        # machine speed, not correctness.  Mapping still runs concurrently
        # WITHIN each frame (and async GBA spans many frames).
        slam.drain_mapping(60.0)
    assert slam.tracking.state.name == "OK"

    created = slam.map.next_kf_id
    culled = sum(1 for k in slam.map.kfs.values() if k.bad)
    assert created >= 200, created
    # the 90% redundancy rule fired on real keyframes
    assert culled >= 5, culled
    assert slam.map.n_keyframes() == created - culled
    # image-level loop closure fired (with async GBA after correction)
    assert slam.loop_closer.n_loops_closed >= 1
    assert any(kf.loop_edges for kf in slam.map.kfs.values())

    ts, Rwc_e, twc_e = slam.tracking.trajectory_tum()
    err = float(ate_rmse(twc_e, np.asarray(twc)[: len(twc_e)]))
    assert err < 0.05, err
    slam.shutdown()
