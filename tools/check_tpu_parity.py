import sys; sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
print("backend:", jax.default_backend())
from airdos_tpu.ops.orientation import keypoint_angles
from airdos_tpu.ops.brief import compute_descriptors

H, W, K = 360, 640, 224
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
# include edge keypoints at the extractor border (16 px)
xs = np.concatenate([rng.integers(16, W-16, K-8), [16, 17, 18, W-17, 16, W-17, 300, 301]]).astype(np.int32)
ys = np.concatenate([rng.integers(16, H-16, K-8), [16, H-17, 17, 18, H-17, 16, 16, H-17]]).astype(np.int32)
ang = rng.uniform(0, 360, K).astype(np.float32)
xs_j, ys_j, ang_j = jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ang)

a_tpu = np.asarray(jax.jit(keypoint_angles)(img, xs_j, ys_j))
d_tpu = np.asarray(jax.jit(compute_descriptors)(img, xs_j, ys_j, ang_j))

# CPU reference
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    img_c = jnp.asarray(np.asarray(img))
    a_cpu = np.asarray(jax.jit(keypoint_angles)(img_c, jnp.asarray(xs), jnp.asarray(ys)))
    d_cpu = np.asarray(jax.jit(compute_descriptors)(img_c, jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ang)))
print("angle maxdiff:", np.abs(((a_tpu - a_cpu + 180) % 360) - 180).max())
print("desc mismatched bytes:", int((d_tpu != d_cpu).sum()), "of", d_cpu.size)
