"""SearchBySim3 mutual matcher (matching/sim3_match.py) on synthetic
two-camera geometry with a known Sim3."""
import numpy as np
import jax.numpy as jnp

from airdos_tpu.matching.sim3_match import match_by_sim3


def _setup(rng, N=64, bad_sim3=False):
    fx = fy = 320.0
    cx, cy = 160.0, 120.0
    w, h = 320, 240
    pts = np.stack([rng.uniform(-3, 3, N), rng.uniform(-2, 2, N),
                    rng.uniform(5, 15, N)], axis=1).astype(np.float32)
    # cam1 = identity; cam2 = small rotation + translation
    ang = 0.1
    R2 = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                   [-np.sin(ang), 0, np.cos(ang)]], np.float32)
    t2 = np.array([0.5, 0.1, -0.3], np.float32)
    x1 = pts                                 # cam1 frame
    x2 = (R2 @ pts.T).T + t2                 # cam2 frame
    # true S12: x1 = R12 x2 + t12  =>  R12 = R2^T, t12 = -R2^T t2
    R12 = R2.T
    t12 = -R2.T @ t2
    if bad_sim3:
        t12 = t12 + np.array([3.0, 2.0, 0.0], np.float32)

    def feats(xc):
        u = fx * xc[:, 0] / xc[:, 2] + cx
        v = fy * xc[:, 1] / xc[:, 2] + cy
        return np.stack([u, v], axis=1).astype(np.float32)

    feat1_xy = feats(x1)
    feat2_xy = feats(x2)
    desc = rng.integers(0, 2 ** 32, (N, 8), dtype=np.uint64).astype(np.uint32)
    oct0 = np.zeros(N, np.int32)
    valid = np.ones(N, bool)
    scale_factors = np.asarray([1.2 ** i for i in range(4)], np.float32)

    x2_in_c1 = (x2 @ R12.T) + t12
    x1_in_c2 = (x1 - t12) @ R12              # S21 applied
    maxd1 = np.linalg.norm(x1_in_c2, axis=1).astype(np.float32)
    maxd2 = np.linalg.norm(x2_in_c1, axis=1).astype(np.float32)

    res = match_by_sim3(
        jnp.asarray(x2_in_c1), jnp.asarray(valid), jnp.asarray(desc),
        jnp.asarray(maxd2),
        jnp.asarray(x1_in_c2), jnp.asarray(valid), jnp.asarray(desc),
        jnp.asarray(maxd1),
        jnp.asarray(feat1_xy), jnp.asarray(oct0), jnp.asarray(desc),
        jnp.asarray(valid),
        jnp.asarray(feat2_xy), jnp.asarray(oct0), jnp.asarray(desc),
        jnp.asarray(valid),
        fx, fy, cx, cy, w, h,
        jnp.asarray(scale_factors), float(np.log(1.2)), 4)
    return res, N


def test_mutual_matches_found(rng):
    res, N = _setup(rng)
    idx2 = np.asarray(res.idx2_of_1)
    # identical descriptors at identical slots: match i -> i
    found = np.nonzero(idx2 >= 0)[0]
    assert len(found) > 0.8 * N
    assert (idx2[found] == found).all()


def test_wrong_sim3_rejects(rng):
    res, N = _setup(rng, bad_sim3=True)
    idx2 = np.asarray(res.idx2_of_1)
    correct = (idx2 == np.arange(len(idx2))).sum()
    assert correct < 0.2 * N
