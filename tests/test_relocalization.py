"""Image-level relocalization end to end (reference Tracking::Relocalization,
Tracking.cc:1493-1654): blank frames mid-sequence force LOST, recovery must
go through the BoW candidate -> EPnP-RANSAC -> >=50-inlier path, and the
exported trajectory must hold the last pose through the blackout
(Tracking.cc:533-540 repeats the last relative pose while LOST) instead of
emitting garbage."""
import dataclasses

import numpy as np
import pytest

from airdos_tpu.config import SlamConfig
from airdos_tpu.io.synthetic import SyntheticStereoWorld, small_camera
from airdos_tpu.io.tum import ate_rmse
from airdos_tpu.slam.system import System


def _cfg():
    cfg = SlamConfig()
    cfg.camera = small_camera()
    cfg.orb.n_features = 600
    cfg.orb.n_levels = 4
    cfg.system.is_offline = True
    cfg.device.max_keypoints = 1024
    cfg.device.max_local_kfs = 8
    cfg.device.max_fixed_kfs = 4
    cfg.device.max_local_points = 1024
    cfg.device.max_ba_edges = 4096
    return cfg


def _run(frames):
    slam = System(_cfg())
    for d in frames:
        slam.track_stereo(d)
    ts, R_e, t_e = slam.tracking.trajectory_tum()
    state = slam.tracking.state.name
    reloc_frame = slam.tracking.last_reloc_frame
    n_kfs = slam.map.n_keyframes()
    slam.shutdown()
    return t_e, state, reloc_frame, n_kfs


@pytest.mark.e2e
def test_relocalization_from_images(tmp_path):
    cfg = _cfg()
    world = SyntheticStereoWorld(seed=0, n_points=200, cam=cfg.camera)
    # >5 keyframes must exist when tracking dies, or the reference's
    # early-loss rule resets instead of relocalizing (Tracking.cc:508)
    n_good, n_blank, n_recover = 18, 3, 5
    Rwc, twc = world.trajectory(n_good, dt=0.1, speed=0.35, yaw_rate=0.012)
    # camera pauses at the last pose through the blackout + recovery
    poses = list(zip(Rwc, twc)) + \
        [(Rwc[-1], twc[-1])] * (n_blank + n_recover)
    frames = [world.frame(i, R, t, i * 0.1, with_humans=False)
              for i, (R, t) in enumerate(poses)]
    gt = np.asarray([t for _, t in poses])

    blanked = list(frames)
    for i in range(n_good, n_good + n_blank):
        blanked[i] = dataclasses.replace(
            frames[i],
            image_left=np.zeros_like(frames[i].image_left),
            image_right=np.zeros_like(frames[i].image_right))

    t_cut, state, reloc_frame, n_kfs = _run(blanked)
    assert state == "OK", "tracking must recover after the blackout"
    # recovery went through the BoW->EPnP path, not a lucky fallback
    assert reloc_frame >= n_good + n_blank, reloc_frame
    # held poses through the blackout: no jump in the TUM export
    steps = np.linalg.norm(np.diff(t_cut, axis=0), axis=1)
    assert steps.max() < 0.12, steps.max()

    # post-recovery accuracy within 2x of the uninterrupted run
    t_full, state_full, _, _ = _run(frames)
    assert state_full == "OK"
    ate_cut = float(ate_rmse(t_cut, gt[: len(t_cut)]))
    ate_full = float(ate_rmse(t_full, gt[: len(t_full)]))
    assert ate_cut < max(2.0 * ate_full, 0.05), (ate_cut, ate_full)
