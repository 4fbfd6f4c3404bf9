#!/usr/bin/env python
"""KITTI odometry stereo driver (reference: Examples/Stereo/stereo_kitti.cc).

Usage:
    python examples/stereo_kitti.py <settings.yaml> <sequence_dir> <traj_out>
"""
import sys
import time


def main():
    if len(sys.argv) < 4:
        print(__doc__)
        return 1
    settings, seq_dir, traj_out = sys.argv[1:4]
    from airdos_tpu.config import SlamConfig
    from airdos_tpu.io.datasets import KittiStereoSequence
    from airdos_tpu.slam.system import System

    cfg = SlamConfig.from_yaml(settings)
    cfg.human.ok = False
    seq = KittiStereoSequence(seq_dir, start=cfg.scheduler.n_start_image,
                              end=cfg.scheduler.n_end_image)
    slam = System(cfg)
    times = []
    for data in seq:
        t0 = time.perf_counter()
        slam.track_stereo(data)
        times.append(time.perf_counter() - t0)
    slam.shutdown()
    slam.save_trajectory_kitti(traj_out)
    times.sort()
    print(f"median tracking time: {times[len(times) // 2]:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
