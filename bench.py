"""Benchmark: end-to-end stereo tracking throughput on TPU.

Runs the full SLAM tracking step (frame front-end + matching + pose
optimization + keyframing/local-BA amortized) on a synthetic sequence with
the TartanAir-Shibuya camera geometry (640x360, fx 772.5, 1000 ORB
features, 8 pyramid levels — tartanair.yaml budgets).

Prints ONE JSON line.  Baseline: the reference's real-time budget on this
dataset is 2.0 fps (Camera.fps, tartanair.yaml:22; BASELINE.md) — the
reference repo records no faster number.  vs_baseline = tracking_fps / 2.0.
"""
import json
import time

import numpy as np


def main():
    from airdos_tpu.config import SlamConfig
    from airdos_tpu.io.synthetic import SyntheticStereoWorld, default_camera
    from airdos_tpu.slam.system import System

    cfg = SlamConfig()
    cfg.camera = default_camera()          # TartanAir-Shibuya geometry
    cfg.orb.n_features = 1000
    cfg.orb.n_levels = 8
    cfg.human.ok = False
    # offline (synchronous, deterministic) — the paper configuration; the
    # online mapping thread crashes the tunneled-TPU client (not thread-safe)
    cfg.system.is_offline = True
    cfg.device.max_keypoints = 2048
    cfg.device.max_local_kfs = 8
    cfg.device.max_fixed_kfs = 4
    cfg.device.max_local_points = 2048
    cfg.device.max_ba_edges = 8192

    world = SyntheticStereoWorld(seed=0, n_points=200)
    n_warm, n_bench = 6, 14
    frames = []
    Rwc, twc = world.trajectory(n_warm + n_bench, 0.1)
    for i in range(n_warm + n_bench):
        frames.append(world.frame(i, Rwc[i], twc[i], i * 0.1,
                                  with_humans=False))

    slam = System(cfg)
    # warm-up: compiles every device program used on the steady-state path
    for i in range(n_warm):
        slam.track_stereo(frames[i])

    t0 = time.perf_counter()
    for i in range(n_warm, n_warm + n_bench):
        slam.track_stereo(frames[i])
    dt = time.perf_counter() - t0
    fps = n_bench / dt

    baseline_fps = 2.0     # dataset real-time budget (tartanair.yaml:22)
    print(json.dumps({
        "metric": "tracking_fps",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 3),
    }))


if __name__ == "__main__":
    main()
