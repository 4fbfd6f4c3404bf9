"""Where does the 1000->1500 feature budget cost land? Times the ORB
extractor alone and the full front-end at both budgets on the TPU."""
import sys
sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

from airdos_tpu.features.orb import OrbExtractor
from airdos_tpu.io.synthetic import SyntheticStereoWorld

world = SyntheticStereoWorld(seed=0, n_points=500)
Rwc, twc = world.trajectory(2, 0.1, speed=0.3, yaw_rate=0.005)
data = world.frame(0, Rwc[0], twc[0], 0.0, with_humans=False)
img = jnp.asarray(data.image_left.astype(np.float32))
mask = jnp.ones_like(img)


def t_amort(fn, *a, N=10):
    r = fn(*a)
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    rs = [fn(*a) for _ in range(N)]
    np.asarray(jax.tree_util.tree_leaves(rs[-1])[0])
    return (time.perf_counter() - t0) / N * 1e3


for nf in (1000, 1500):
    ext = OrbExtractor(nf, 1.2, 8)
    ms = t_amort(ext, img, mask)
    # flops of the compiled extractor
    try:
        c = ext._jitted.lower(img, mask).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        gf = c.get("flops", 0) / 1e9
    except Exception:
        gf = float("nan")
    print(f"n_features={nf}: extractor {ms:.1f} ms  {gf:.1f} GFLOP")

# per-stage inside the extractor at 1500: time angle/brief/select separately
from airdos_tpu.ops.brief import compute_descriptors
from airdos_tpu.ops.fast import fast_score_map
from airdos_tpu.ops.filters import gaussian_blur7
from airdos_tpu.ops.orientation import keypoint_angles
from airdos_tpu.ops.pyramid import build_pyramid

ext = OrbExtractor(1500, 1.2, 8)
pyr = jax.jit(lambda i, m: build_pyramid(i, m, 8, 1.2))(img, mask)
print(f"pyramid: {t_amort(jax.jit(lambda i, m: build_pyramid(i, m, 8, 1.2)), img, mask):.1f} ms")

for lvl in (0, 1):
    im = pyr.images[lvl]
    q = ext.quotas[lvl]
    xs = jnp.asarray(np.random.default_rng(0).integers(20, im.shape[1] - 20, q), jnp.int32)
    ys = jnp.asarray(np.random.default_rng(1).integers(20, im.shape[0] - 20, q), jnp.int32)
    ang = jnp.zeros(q, jnp.float32) + 30.0
    f_fast = jax.jit(fast_score_map)
    f_ang = jax.jit(keypoint_angles)
    f_blur = jax.jit(gaussian_blur7)
    f_desc = jax.jit(compute_descriptors)
    blurred = f_blur(im)
    print(f"lvl{lvl} q={q} {im.shape}: fast {t_amort(f_fast, im):.2f} ms  "
          f"angle {t_amort(f_ang, im, xs, ys):.2f} ms  "
          f"blur {t_amort(f_blur, im):.2f} ms  "
          f"brief {t_amort(f_desc, blurred, xs, ys, ang):.2f} ms")
