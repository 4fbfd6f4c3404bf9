"""The AirDOS headline claim, system-level (reference: the ICRA 2022
paper's reason to exist, Optimizer.cc:1496-2224): on a dynamic scene
with a slow coherently-drifting crowd, the masked + human-trajectory-BA
pipeline must produce BETTER camera ATE than the naive static pipeline
that ingests the moving humans.

Slow crowd motion (~1-2 px/frame) stays inside the pose optimizer's
chi-square inlier gate, so the unmasked pipeline absorbs the moving
features as inliers and accumulates bias every frame; fast walkers, by
contrast, are cleanly rejected as outliers and poison nothing.  The
same scene/config pair is what bench.py reports as ate_rmse_static /
ate_rmse_human.
"""
import numpy as np
import pytest

from airdos_tpu.config import SlamConfig
from airdos_tpu.io.synthetic import SyntheticStereoWorld, default_camera
from airdos_tpu.io.tum import ate_rmse
from airdos_tpu.slam.system import System


def _cfg(mask: bool, human_ba: bool) -> SlamConfig:
    cfg = SlamConfig()
    cfg.camera = default_camera()
    cfg.orb.n_features = 1000
    cfg.orb.n_levels = 8
    cfg.human.ok = human_ba or mask
    cfg.human.is_seg = mask
    cfg.system.is_mask = mask
    cfg.optimizer.is_static_only = not human_ba
    cfg.camera.fps = 5.0
    cfg.system.is_offline = True
    cfg.device.max_keypoints = 2048
    cfg.device.max_local_kfs = 8
    cfg.device.max_fixed_kfs = 4
    cfg.device.max_local_points = 2048
    cfg.device.max_ba_edges = 8192
    cfg.device.max_trajectories = 8
    cfg.device.max_trajectory_len = 8
    return cfg


def _run(cfg, frames, gts):
    slam = System(cfg)
    fn = slam.track_stereo_human if cfg.human.ok else slam.track_stereo
    for f in frames:
        fn(f)
    ts, _, twc_e = slam.tracking.trajectory_tum()
    ate = float(ate_rmse(twc_e, np.asarray(gts)[: len(twc_e)]))
    slam.shutdown()
    return ate


@pytest.mark.slow
def test_human_pipeline_beats_naive_static_on_crowd_scene():
    n_total = 14
    world = SyntheticStereoWorld(seed=2, n_points=500, n_humans=10,
                                 crowd=True)
    Rwc, twc = world.trajectory(n_total, 0.1, yaw_rate=0.005)
    frames = [world.frame(i, Rwc[i], twc[i], i * 0.1, with_humans=True)
              for i in range(n_total)]

    ate_naive = _run(_cfg(mask=False, human_ba=False), frames, twc)
    ate_flagship = _run(_cfg(mask=True, human_ba=True), frames, twc)

    # measured margins (CPU, ~34% crowd pixel coverage): naive 0.0116 m vs
    # flagship 0.0033 m (3.5x); seeds 0/1 of the same world give 1.7x/2.1x.
    # The assertion leaves room for backend-to-backend f32 variation while
    # still requiring a decisive win
    assert ate_flagship < 0.6 * ate_naive, (ate_flagship, ate_naive)
    assert ate_flagship < 0.03, ate_flagship
