import sys; sys.path.insert(0, "/root/repo")
import os, numpy as np

mode = sys.argv[1] if len(sys.argv) > 1 else "tpu"
import jax
if mode == "cpu":
    jax.config.update("jax_platforms", "cpu")
import bench
from airdos_tpu.io.synthetic import SyntheticStereoWorld
from airdos_tpu.slam.system import System

world = SyntheticStereoWorld(seed=0, n_points=500)
Rwc, twc = world.trajectory(3, 0.1, speed=0.3, yaw_rate=0.005)
frames = [world.frame(i, Rwc[i], twc[i], i * 0.1, with_humans=False)
          for i in range(3)]
cfg = bench._cfg(human=False)
slam = System(cfg)
f = slam.frontend.build_frame(frames[1])
np.savez(f"/tmp/stereo_{mode}.npz", u=np.asarray(f.u_right), d=np.asarray(f.depth))
print("saved", mode)
