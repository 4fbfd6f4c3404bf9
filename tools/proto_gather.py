import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np
import jax, jax.numpy as jnp
from airdos_tpu.ops.orientation import keypoint_angles, _moment_kernels, _umax, HALF_PATCH

H, W, K = 360, 640, 224
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
xs = jnp.asarray(rng.integers(16, W - 16, K).astype(np.int32))
ys = jnp.asarray(rng.integers(16, H - 16, K).astype(np.int32))

def t_amort(fn, *a, N=20):
    r = fn(*a); jax.device_get(jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    rs = [fn(*a) for _ in range(N)]
    jax.device_get(jax.tree_util.tree_leaves(rs[-1])[0])
    return (time.perf_counter() - t0) / N * 1e3

# A: current (2D gather)
fA = jax.jit(keypoint_angles)
print(f"A 2D-gather: {t_amort(fA, img, xs, ys):.3f} ms")

# B: row gather + iota-mask reduction
umax = _umax()
def angles_B(img, xs, ys):
    h, w = img.shape
    dy = jnp.arange(-HALF_PATCH, HALF_PATCH + 1)
    gy = jnp.clip(ys[:, None] + dy[None, :], 0, h - 1)       # [K,31]
    rows = img[gy.reshape(-1)].reshape(K, 31, w)             # row gather
    ww = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
    dx = ww - xs[:, None, None]                              # [K,1,w]
    u = jnp.asarray(umax)[jnp.abs(dy)]                       # [31]
    mask = (jnp.abs(dx) <= u[None, :, None]).astype(jnp.float32)
    m10 = jnp.sum(rows * (dx.astype(jnp.float32) * mask), axis=(1, 2))
    m01 = jnp.sum(rows * (dy.astype(jnp.float32)[None, :, None] * mask), axis=(1, 2))
    ang = jnp.degrees(jnp.arctan2(m01, m10))
    return jnp.where(ang < 0, ang + 360.0, ang)
fB = jax.jit(angles_B)
print(f"B row-gather+mask: {t_amort(fB, img, xs, ys):.3f} ms")

# C: one-hot matmul rows + mask reduction
def angles_C(img, xs, ys):
    h, w = img.shape
    dy = jnp.arange(-HALF_PATCH, HALF_PATCH + 1)
    gy = jnp.clip(ys[:, None] + dy[None, :], 0, h - 1).reshape(-1)  # [K*31]
    hh = jax.lax.broadcasted_iota(jnp.int32, (K * 31, h), 1)
    onehot = (hh == gy[:, None]).astype(jnp.float32)
    rows = (onehot @ img).reshape(K, 31, w)
    ww = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
    dx = ww - xs[:, None, None]
    u = jnp.asarray(umax)[jnp.abs(dy)]
    mask = (jnp.abs(dx) <= u[None, :, None]).astype(jnp.float32)
    m10 = jnp.sum(rows * (dx.astype(jnp.float32) * mask), axis=(1, 2))
    m01 = jnp.sum(rows * (dy.astype(jnp.float32)[None, :, None] * mask), axis=(1, 2))
    ang = jnp.degrees(jnp.arctan2(m01, m10))
    return jnp.where(ang < 0, ang + 360.0, ang)
fC = jax.jit(angles_C)
print(f"C onehot-matmul+mask: {t_amort(fC, img, xs, ys):.3f} ms")

# agreement
a, b, c = fA(img, xs, ys), fB(img, xs, ys), fC(img, xs, ys)
print("maxdiff A-B:", float(jnp.max(jnp.abs(a - b))), "A-C:", float(jnp.max(jnp.abs(a - c))))
