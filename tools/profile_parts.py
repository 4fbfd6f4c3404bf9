import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np
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
fe = slam.frontend

data = frames[7]
imL, imR, maskL, maskR = fe.uploads(data)
if maskL is None:
    maskL = tr._ones_mask_dev; maskR = tr._ones_mask_dev

# time front-end alone (same _build_impl the fused step calls)
build = jax.jit(lambda l, r, ml, mr: fe._build_impl(
    l.astype(jnp.float32), r.astype(jnp.float32),
    ml.astype(jnp.float32), mr.astype(jnp.float32),
    jnp.full((1, 2), -1.0), with_disparity=False))
def t_amort(fn, *a, N=10):
    r = fn(*a); jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
    jax.device_get(jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    rs = [fn(*a) for _ in range(N)]
    jax.device_get(jax.tree_util.tree_leaves(rs[-1])[0])
    return (time.perf_counter() - t0) / N * 1e3
print(f"front-end _build_impl amortized: {t_amort(build, imL, imR, maskL, maskR):.1f} ms")
