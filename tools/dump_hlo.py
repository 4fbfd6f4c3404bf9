import sys; sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
import bench
from airdos_tpu.io.synthetic import SyntheticStereoWorld
from airdos_tpu.slam.system import System

n_total = 8
world = SyntheticStereoWorld(seed=0, n_points=500)
Rwc, twc = world.trajectory(n_total, 0.1, speed=0.3, yaw_rate=0.005)
frames = [world.frame(i, Rwc[i], twc[i], i * 0.1, with_humans=False)
          for i in range(n_total)]
cfg = bench._cfg(human=False)
slam = System(cfg)
for i in range(7):
    slam.track_stereo(frames[i])
tr = slam.tracking
orig = tr._full_step
captured = {}
def capture(*a, **k):
    captured["a"], captured["k"] = a, k
    return orig(*a, **k)
tr._full_step = capture
slam.track_stereo(frames[7])
a, k = captured["a"], captured["k"]
lowered = orig.lower(*a, **k)
comp = lowered.compile()
txt = comp.as_text()
open("/tmp/step_hlo.txt", "w").write(txt)
print("bytes", len(txt))
