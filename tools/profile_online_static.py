"""Full profiler dump of the bench's static ONLINE section on the TPU:
per-stage medians, per-frame wall times, KF cadence — to attribute the
gap between the ~20 ms fused step and the ~150 ms/frame wall time."""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np

import bench
from airdos_tpu.io.synthetic import SyntheticStereoWorld
from airdos_tpu.slam.system import System

n_warm, n_bench = 8, 20
n_total = n_warm + n_bench
world = SyntheticStereoWorld(seed=0, n_points=500)
Rwc, twc = world.trajectory(n_total, 0.1, speed=0.3, yaw_rate=0.005)
frames = [world.frame(i, Rwc[i], twc[i], i * 0.1, with_humans=False)
          for i in range(n_total)]

cfg = bench._cfg(human=False)
cfg.system.is_offline = False
slam = System(cfg)
for i in range(n_warm):
    if i + 1 < len(frames):
        slam.prefetch(frames[i + 1])
    slam.track_stereo(frames[i])
slam.profiler.stages.clear()
t0 = time.perf_counter()
wall, pref = [], []
for i in range(n_warm, len(frames)):
    tp = time.perf_counter()
    if i + 1 < len(frames):
        slam.prefetch(frames[i + 1])
    pref.append(time.perf_counter() - tp)
    tf = time.perf_counter()
    slam.track_stereo(frames[i])
    wall.append(time.perf_counter() - tf)
dt = time.perf_counter() - t0
print(f"fps {(len(frames) - n_warm) / dt:.2f}  "
      f"wall/frame median {np.median(wall)*1e3:.1f} ms  "
      f"max {max(wall)*1e3:.1f} ms  "
      f"prefetch median {np.median(pref)*1e3:.1f} ms")
print("per-frame ms:", " ".join(f"{w*1e3:.0f}" for w in wall))
print("prefetch  ms:", " ".join(f"{w*1e3:.0f}" for w in pref))
slam.shutdown()
print(slam.profiler.summary())
print("KFs created:", slam.map.next_kf_id, "alive:", slam.map.n_keyframes())
