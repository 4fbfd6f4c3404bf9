import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np
import jax, jax.numpy as jnp

xs = [jnp.zeros((1000, 8), jnp.float32) for _ in range(5)]
one = jnp.zeros((1000, 40), jnp.float32)
f5 = jax.jit(lambda *a: tuple(x + 1 for x in a))
f1 = jax.jit(lambda x: x + 1)
scal = jax.jit(lambda x: jnp.sum(x))

def t(fn_make, N=20):
    r = fn_make(); jax.device_get(r)
    t0 = time.perf_counter()
    for _ in range(N):
        r = fn_make()
        jax.device_get(r)
    return (time.perf_counter() - t0) / N * 1e3

print(f"dispatch+get 5 leaves: {t(lambda: f5(*xs)):.2f} ms")
print(f"dispatch+get 1 leaf  : {t(lambda: f1(one)):.2f} ms")
print(f"dispatch+get scalar  : {t(lambda: scal(one)):.2f} ms")
# upload cost: 5 arrays vs 1
up5 = [np.zeros((1000, 8), np.float32) for _ in range(5)]
up1 = np.zeros((1000, 40), np.float32)
def tu(arrs, N=20):
    r = f1(one); jax.device_get(r)
    t0 = time.perf_counter()
    for _ in range(N):
        ds = [jnp.asarray(a) for a in (arrs if isinstance(arrs, list) else [arrs])]
        jax.device_get(f1(one))
    return (time.perf_counter() - t0) / N * 1e3
print(f"upload 5 + rt: {tu(up5):.2f} ms")
print(f"upload 1 + rt: {tu(up1):.2f} ms")
# big image upload
img = np.zeros((360, 640), np.uint8)
print(f"upload img(230KB) + rt: {tu([img, img, img, img]):.2f} ms")
