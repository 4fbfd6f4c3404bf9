"""Loop closing end-to-end FROM PIXELS (reference LoopClosing pipeline:
DetectLoop -> ComputeSim3 (SearchBySim3 + >=40-point gate) -> CorrectLoop
(SearchAndFuse + essential graph + global BA), LoopClosing.cc:57-88).

Testbed: the camera orbits a textured octagonal PILLAR (the classic
turntable loop scene).  Each prism face is near-frontal to the camera
for ~1/4 lap and carries a distinct texture seed, so (a) stereo matching
is strong at every heading (no slant shear, no intra-patch dot
parallax), (b) covisibility with the lap start genuinely decays mid-lap
(faces rotate out of view), and (c) the revisit's BoW query is
discriminative.  The loop closer must re-recognize the start region
from images alone, pass the Sim3 + >=40-point protocol, and correct the
map."""
import numpy as np
import pytest

from airdos_tpu.config import SlamConfig
from airdos_tpu.io.synthetic import SyntheticStereoWorld, small_camera
from airdos_tpu.io.tum import ate_rmse
from airdos_tpu.slam.system import System


@pytest.mark.e2e
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
    cfg.system.is_offline = True
    cfg.enable_loop_closing = True

    world = SyntheticStereoWorld(seed=1, n_points=300, cam=cfg.camera,
                                 centered=True, world_size=(16.0, 3.0, 16.0),
                                 clear_ring=(1.35, 0.0, 1.35, 0.7),
                                 ring_outside_only=True, room_radius=4.5,
                                 pillar=(1.35, 0.0, 0.55, 8))
    slam = System(cfg)
    N = 84
    Rwc, twc = world.orbit_loop_trajectory(N, radius=1.35, laps=1.22)
    gt = []
    for i in range(N):
        data = world.frame(i, Rwc[i], twc[i], i * 0.2, with_humans=False)
        slam.track_stereo(data)
        gt.append(twc[i])
    assert slam.tracking.state.name == "OK"
    assert slam.loop_closer is not None
    # the loop was detected, passed the Sim3 protocol, and was corrected
    assert slam.loop_closer.n_loops_closed >= 1
    # a loop edge links the revisit keyframe to the lap-start region
    assert any(kf.loop_edges for kf in slam.map.kfs.values())
    # after correction the trajectory stays metrically consistent with GT
    ts, Rwc_e, twc_e = slam.tracking.trajectory_tum()
    err = ate_rmse(twc_e, np.asarray(gt)[: len(twc_e)])
    assert err < 0.15, err
    slam.shutdown()
