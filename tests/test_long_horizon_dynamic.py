"""Long-horizon dynamic e2e (VERDICT r4 #8): a >=100-frame crowd run with
natural track churn — the camera drives THROUGH the drifting crowd, so
humans enter and leave the field of view, trajectories start and end
mid-sequence — asserting (a) the flagship ATE margin over the naive
static pipeline holds over the long horizon and (b) human-state quality:
joint RMSE vs ground truth, limb-length convergence to the rest skeleton,
and motion-model velocity error (the quantities Tracking::SaveMap dumps,
reference Tracking.cc:1745-1836)."""
import numpy as np
import pytest

from airdos_tpu.config import SlamConfig
from airdos_tpu.io.synthetic import (BODY1, BODY2, _SKELETON_REST,
                                     SyntheticStereoWorld, small_camera)
from airdos_tpu.io.tum import ate_rmse
from airdos_tpu.slam.map import TH_LONG_TRAJECTORY
from airdos_tpu.slam.system import System

N_FRAMES = 110
DT = 0.1


def _cfg(mask: bool, human_ba: bool) -> SlamConfig:
    cfg = SlamConfig()
    cfg.camera = small_camera()
    cfg.camera.fps = 5.0
    cfg.orb.n_features = 600
    cfg.orb.n_levels = 4
    cfg.human.ok = human_ba or mask
    cfg.human.is_seg = mask
    cfg.system.is_mask = mask
    cfg.optimizer.is_static_only = not human_ba
    cfg.system.is_offline = True
    cfg.device.max_keypoints = 1024
    cfg.device.max_local_kfs = 8
    cfg.device.max_fixed_kfs = 4
    cfg.device.max_local_points = 1024
    cfg.device.max_ba_edges = 4096
    cfg.device.max_trajectories = 8
    cfg.device.max_trajectory_len = 8
    return cfg


@pytest.fixture(scope="module")
def crowd_run():
    """Rendered 110-frame crowd sequence + both pipelines' results."""
    world = SyntheticStereoWorld(seed=2, n_points=500, n_humans=10,
                                 cam=small_camera(), crowd=True)
    Rwc, twc = world.trajectory(N_FRAMES, DT, speed=0.35, yaw_rate=0.003)
    frames = [world.frame(i, Rwc[i], twc[i], i * DT, with_humans=True)
              for i in range(N_FRAMES)]

    def run(cfg):
        slam = System(cfg)
        fn = slam.track_stereo_human if cfg.human.ok else slam.track_stereo
        for f in frames:
            fn(f)
        ts, _, twc_e = slam.tracking.trajectory_tum()
        ate = float(ate_rmse(twc_e, np.asarray(twc)[: len(twc_e)]))
        state = slam.tracking.state.name
        slam.shutdown()
        return slam, ate, state

    slam_h, ate_h, state_h = run(_cfg(mask=True, human_ba=True))
    _, ate_n, state_n = run(_cfg(mask=False, human_ba=False))
    return world, slam_h, ate_h, state_h, ate_n, state_n


@pytest.mark.slow
def test_long_horizon_flagship_margin(crowd_run):
    world, slam, ate_h, state_h, ate_n, state_n = crowd_run
    assert state_h == "OK"
    # the flagship margin holds over the long horizon.  Measured (CPU):
    # human 0.0159 vs naive 0.0224 (1.41x).  The margin is thinner than
    # the 14-frame flagship scene's 3.5x because the camera drives THROUGH
    # the crowd: once past it, both pipelines see a clean scene and the
    # naive run stops accumulating bias — the win comes from the crowded
    # first half.  The assertion demands a decisive directional win with
    # room for backend f32 variation.
    assert ate_h < 0.8 * ate_n, (ate_h, ate_n)
    assert ate_h < 0.05, ate_h


@pytest.mark.slow
def test_long_horizon_track_churn(crowd_run):
    """Humans genuinely enter/leave: some trajectories END mid-run and
    some START mid-run (broken/occluded tracks churning through the
    bounded max_trajectories window)."""
    world, slam, *_ = crowd_run
    trajs = slam.map.trajectories
    assert len(trajs) >= 4, len(trajs)
    t_end = (N_FRAMES - 1) * DT
    first = np.asarray([t.poses[0].timestamp for t in trajs.values()])
    last = np.asarray([t.poses[-1].timestamp for t in trajs.values()])
    assert (last < t_end - 10 * DT).sum() >= 1, last    # ended early
    assert (first > 10 * DT).sum() >= 1, first          # started late


@pytest.mark.slow
def test_long_horizon_human_state_quality(crowd_run):
    world, slam, *_ = crowd_run
    trajs = [t for t in slam.map.trajectories.values()
             if t.optimized and len(t) > TH_LONG_TRAJECTORY]
    assert trajs, "no optimized long trajectory"

    seg_gt = np.linalg.norm(_SKELETON_REST[BODY1] - _SKELETON_REST[BODY2],
                            axis=1)
    joint_errs, vel_errs, seg_errs = [], [], []
    for tr in trajs:
        hu = world.humans[tr.track_id]
        # joint RMSE vs GT over optimized, non-bad joints
        for hp in tr.poses:
            gt = hu.joints_at(hp.timestamp) * 1.0
            ok = hp.optimized[:14] & ~hp.bad[:14]
            if ok.any():
                d = np.linalg.norm(hp.joints_w[:14][ok] - gt[:14][ok],
                                   axis=1)
                joint_errs.extend(d.tolist())
        # motion-model velocity error
        vel_errs.append(np.linalg.norm(tr.motion_t - hu.velocity))
        # limb lengths converge to the (scaled) rest skeleton
        opt = tr.segment_optimized & ~tr.segment_bad
        if opt.any():
            seg_errs.extend(
                np.abs(tr.segment_len[opt] - hu.scale * seg_gt[opt]).tolist())

    med_joint = float(np.median(joint_errs))
    med_vel = float(np.median(vel_errs))
    med_seg = float(np.median(seg_errs)) if seg_errs else 0.0
    # stereo depth noise floor at z~3-8 m with bf=80 is ~0.1-0.5 m; the
    # BA-refined states must sit near it, not drift over the long horizon
    assert med_joint < 0.5, med_joint
    assert med_vel < 0.6, med_vel
    assert med_seg < 0.15, med_seg
