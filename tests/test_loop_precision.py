"""Loop-detection precision: a loop-free forward corridor sequence must
produce ZERO loop closures (false-positive gate; reference DetectLoop's
covisibility exclusion + 3-consistency protocol, LoopClosing.cc:103-229,
and the >=40-point ComputeSim3 gate, LoopClosing.cc:350-390)."""
import numpy as np
import pytest

from airdos_tpu.config import SlamConfig
from airdos_tpu.io.synthetic import SyntheticStereoWorld, small_camera
from airdos_tpu.slam.system import System


@pytest.mark.slow
def test_loop_free_corridor_zero_corrections():
    cfg = SlamConfig()
    cfg.camera = small_camera()
    cfg.camera.fps = 5.0
    cfg.orb.n_features = 600
    cfg.orb.n_levels = 4
    cfg.human.ok = False
    cfg.device.max_keypoints = 1024
    cfg.device.max_local_kfs = 8
    cfg.device.max_fixed_kfs = 4
    cfg.device.max_local_points = 1024
    cfg.device.max_ba_edges = 4096
    cfg.enable_loop_closing = True

    world = SyntheticStereoWorld(seed=0, n_points=300, cam=cfg.camera)
    slam = System(cfg)
    for data, Rwc, twc in world.sequence(14, dt=0.1):
        slam.track_stereo(data)
    assert slam.tracking.state.name == "OK"
    # the corridor never revisits anything: no loop may be closed
    if slam.loop_closer is not None:
        assert slam.loop_closer.n_loops_closed == 0
    slam.shutdown()
