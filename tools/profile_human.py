import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np
import bench
from airdos_tpu.io.synthetic import SyntheticStereoWorld
from airdos_tpu.slam.system import System

n_warm, n_bench = 7, 14
n_total = n_warm + n_bench
from bench import N_HUMANS
world = SyntheticStereoWorld(seed=2, n_points=500, n_humans=N_HUMANS, crowd=True)
Rwc, twc = world.trajectory(n_total, 0.1, yaw_rate=0.005)
frames = [world.frame(i, Rwc[i], twc[i], i * 0.1, with_humans=True)
          for i in range(n_total)]
cfg = bench._cfg(human=True)
slam = System(cfg)
for i in range(n_warm):
    if i + 1 < len(frames):
        slam.prefetch(frames[i + 1])
    slam.track_stereo_human(frames[i])
slam.profiler.stages.clear()
t0 = time.perf_counter()
for i in range(n_warm, len(frames)):
    if i + 1 < len(frames):
        slam.prefetch(frames[i + 1])
    slam.track_stereo_human(frames[i])
dt = time.perf_counter() - t0
slam.shutdown()
print(f"fps={(len(frames)-n_warm)/dt:.2f}  ms/frame={dt/(len(frames)-n_warm)*1e3:.1f}")
print(slam.profiler.summary())
