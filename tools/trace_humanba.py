import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np
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
hba._jit = orig
a, k = captured["a"], captured["k"]
r = jax.device_get(orig(*a, **k))
N = 5
t0 = time.perf_counter()
for _ in range(N):
    r = orig(*a, **k)
jax.device_get(jax.tree_util.tree_leaves(r)[0])
t1 = time.perf_counter()
print(f"human BA amortized: {(t1-t0)/N*1e3:.1f} ms")
t0 = time.perf_counter()
for _ in range(N):
    r = jax.device_get(orig(*a, **k))
t1 = time.perf_counter()
print(f"human BA dispatch+full get: {(t1-t0)/N*1e3:.1f} ms")
print("shapes: cams", a[0].shape, "pts", a[3].shape, "edges", a[5].shape,
      "joints", a[10].shape)
jax.profiler.start_trace("/tmp/trace_hba")
r = jax.device_get(orig(*a, **k))
jax.profiler.stop_trace()
