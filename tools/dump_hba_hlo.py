import sys; sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import bench
from airdos_tpu.io.synthetic import SyntheticStereoWorld
from airdos_tpu.slam.system import System

n_total = 14
world = SyntheticStereoWorld(seed=2, n_points=500, n_humans=bench.N_HUMANS, crowd=True)
Rwc, twc = world.trajectory(n_total, 0.1, yaw_rate=0.005)
frames = [world.frame(i, Rwc[i], twc[i], i * 0.1, with_humans=True)
          for i in range(n_total)]
cfg = bench._cfg(human=True)
slam = System(cfg)
hba = slam.human_ba
orig = hba._jit
captured = {}
def cap(*a, **k):
    captured["a"], captured["k"] = a, k
    return orig(*a, **k)
hba._jit = cap
for i in range(n_total):
    slam.track_stereo_human(frames[i])
a, k = captured["a"], captured["k"]
txt = orig.lower(*a, **k).compile().as_text()
open("/tmp/hba_hlo.txt", "w").write(txt)
print("bytes", len(txt))
