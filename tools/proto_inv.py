import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np
import jax, jax.numpy as jnp

def t_amort(fn, *a, N=20):
    r = fn(*a); jax.device_get(jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    rs = [fn(*a) for _ in range(N)]
    jax.device_get(jax.tree_util.tree_leaves(rs[-1])[0])
    return (time.perf_counter() - t0) / N * 1e3

rng = np.random.default_rng(0)
P = 2048
A = rng.normal(size=(P, 3, 3)).astype(np.float32)
A = A @ A.transpose(0, 2, 1) + 3 * np.eye(3, dtype=np.float32)
Aj = jnp.asarray(A)
f1 = jax.jit(jnp.linalg.inv)
print(f"linalg.inv [2048,3,3]: {t_amort(f1, Aj):.3f} ms")

def inv3x3(M):
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A_ = e * i - f * h; B_ = -(d * i - f * g); C_ = d * h - e * g
    D_ = -(b * i - c * h); E_ = a * i - c * g; F_ = -(a * h - b * g)
    G_ = b * f - c * e; H_ = -(a * f - c * d); I_ = a * e - b * d
    det = a * A_ + b * B_ + c * C_
    inv_det = 1.0 / det
    adj = jnp.stack([jnp.stack([A_, D_, G_], -1),
                     jnp.stack([B_, E_, H_], -1),
                     jnp.stack([C_, F_, I_], -1)], -2)
    return adj * inv_det[..., None, None]
f2 = jax.jit(inv3x3)
print(f"closed-form 3x3: {t_amort(f2, Aj):.3f} ms")
print("maxdiff:", float(jnp.max(jnp.abs(f1(Aj) - f2(Aj)))))

D = 2920
Hnp = rng.normal(size=(D, D)).astype(np.float32)
Hnp = Hnp @ Hnp.T + D * np.eye(D, dtype=np.float32)
bnp = rng.normal(size=(D,)).astype(np.float32)
Hj, bj = jnp.asarray(Hnp), jnp.asarray(bnp)
f3 = jax.jit(jnp.linalg.solve)
print(f"linalg.solve {D}: {t_amort(f3, Hj, bj):.3f} ms")
import jax.scipy.linalg as jsl
def chosolve(H, b):
    L = jax.lax.linalg.cholesky(H)
    y = jax.lax.linalg.triangular_solve(L, b[:, None], left_side=True, lower=True)
    return jax.lax.linalg.triangular_solve(L, y, left_side=True, lower=True,
                                           transpose_a=True)[:, 0]
f4 = jax.jit(chosolve)
print(f"cholesky solve {D}: {t_amort(f4, Hj, bj):.3f} ms")
print("maxdiff solve:", float(jnp.max(jnp.abs(f3(Hj, bj) - f4(Hj, bj)))))
P6 = 256
A6 = rng.normal(size=(P6, 6, 6)).astype(np.float32)
A6 = A6 @ A6.transpose(0, 2, 1) + 6 * np.eye(6, dtype=np.float32)
A6j = jnp.asarray(A6)
print(f"linalg.inv [256,6,6]: {t_amort(f1, A6j):.3f} ms")
