"""Loop closing end-to-end: a closed circular trajectory in a centered
synthetic world must be detected and corrected (reference LoopClosing
pipeline: DetectLoop -> ComputeSim3 (SearchBySim3 + >=40-point gate) ->
CorrectLoop (SearchAndFuse + essential graph + global BA))."""
import numpy as np
import pytest

from airdos_tpu.config import SlamConfig
from airdos_tpu.io.synthetic import SyntheticStereoWorld, small_camera
from airdos_tpu.io.tum import ate_rmse
from airdos_tpu.slam.system import System


@pytest.mark.skipif(__import__("os").environ.get("AIRDOS_RUN_SLOW") != "1", reason="long loop-closure e2e; set AIRDOS_RUN_SLOW=1")
@pytest.mark.xfail(reason="the synthetic circle trajectory is not yet "
                   "trackable end-to-end (per-frame rotation + annulus "
                   "texture defeat the matcher before the loop closes); "
                   "loop correction machinery is covered map-level by "
                   "test_loop_correction.py", strict=False)
def test_loop_detected_and_corrected():
    cfg = SlamConfig()
    cfg.camera = small_camera()
    cfg.camera.fps = 5.0                  # KF every ~2 frames
    cfg.orb.n_features = 600
    cfg.orb.n_levels = 4
    cfg.human.ok = False
    cfg.device.max_keypoints = 1024
    cfg.device.max_local_kfs = 8
    cfg.device.max_fixed_kfs = 4
    cfg.device.max_local_points = 1024
    cfg.device.max_ba_edges = 4096
    cfg.enable_loop_closing = True

    world = SyntheticStereoWorld(seed=1, n_points=900, cam=cfg.camera,
                                 centered=True, world_size=(26.0, 8.0, 26.0),
                                 clear_ring=(4.0, 0.0, 4.0, 0.7))
    slam = System(cfg)
    N = 80
    Rwc, twc = world.loop_trajectory(N, radius=4.0)
    gt = []
    for i in range(N):
        data = world.frame(i, Rwc[i], twc[i], i * 0.2, with_humans=False)
        slam.track_stereo(data)
        gt.append(twc[i])
    assert slam.tracking.state.name == "OK"
    assert slam.loop_closer is not None
    assert slam.loop_closer.n_loops_closed >= 1
    # after correction the loop-gap closes: estimated end-of-lap position
    # matches the start region like the ground truth does
    ts, Rwc_e, twc_e = slam.tracking.trajectory_tum()
    err = ate_rmse(twc_e, np.asarray(gt)[: len(twc_e)])
    assert err < 1.0, err
    slam.shutdown()
