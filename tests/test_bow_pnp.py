"""Tests: vocabulary train/transform/score, KF database, EPnP RANSAC, Horn."""
import numpy as np
import jax.numpy as jnp
import pytest

from airdos_tpu.bow.vocabulary import Vocabulary, train_vocabulary, _pack_u32
from airdos_tpu.solvers.align import horn_align
from airdos_tpu.solvers.epnp import epnp_pose, epnp_ransac
from airdos_tpu.geometry.se3 import se3_exp


def random_descs(rng, n):
    return rng.integers(0, 256, (n, 32)).astype(np.uint8)


def test_vocabulary_train_and_transform(rng):
    train = random_descs(rng, 2000)
    voc = train_vocabulary(train, k=6, depth=3, seed=1)
    assert voc.n_words > 50
    d = random_descs(rng, 128)
    bow, wids, fnodes = voc.transform(_pack_u32(d))
    assert (wids >= 0).all()
    assert len(bow) > 10
    # identical descriptors -> identical words
    bow2, wids2, _ = voc.transform(_pack_u32(d))
    assert (wids == wids2).all()
    # score: self-similarity is max, random is lower
    s_self = Vocabulary.score(bow, bow)
    d3 = random_descs(rng, 128)
    bow3, _, _ = voc.transform(_pack_u32(d3))
    s_other = Vocabulary.score(bow, bow3)
    assert s_self > 0.99
    assert s_other < s_self


def test_vocabulary_similar_images_score_higher(rng):
    train = random_descs(rng, 3000)
    voc = train_vocabulary(train, k=6, depth=3, seed=1)
    base = random_descs(rng, 200)
    # "same place": 80% same descriptors + some new
    similar = base.copy()
    similar[:40] = random_descs(rng, 40)
    other = random_descs(rng, 200)
    b0, _, _ = voc.transform(_pack_u32(base))
    b1, _, _ = voc.transform(_pack_u32(similar))
    b2, _, _ = voc.transform(_pack_u32(other))
    s_sim = Vocabulary.score(b0, b1)
    s_other = Vocabulary.score(b0, b2)
    assert s_sim > 1.2 * s_other, (s_sim, s_other)
    assert s_sim > 0.5


def test_vocabulary_npz_roundtrip(rng, tmp_path):
    voc = train_vocabulary(random_descs(rng, 500), k=4, depth=2)
    p = tmp_path / "voc.npz"
    voc.save_npz(p)
    voc2 = Vocabulary.load_npz(p)
    d = _pack_u32(random_descs(rng, 32))
    _, w1, _ = voc.transform(d)
    _, w2, _ = voc2.transform(d)
    assert (w1 == w2).all()


def test_vocabulary_dbow2_binary_roundtrip(rng, tmp_path):
    """The ORBvoc.bin 41-byte-record format (reference
    TemplatedVocabulary.h:1671-1745, Vocabulary/to_binary.cc): save ->
    load must preserve the tree, weights, and word assignments."""
    from airdos_tpu.bow.vocabulary import load_dbow2_binary, save_dbow2_binary
    voc = train_vocabulary(random_descs(rng, 500), k=4, depth=2)
    p = tmp_path / "voc.bin"
    save_dbow2_binary(voc, p)
    # header sanity: n_nodes, size_node=41
    import numpy as np
    hdr = np.frombuffer(p.read_bytes()[:24], dtype="<u4, <u4, <i4, <i4, <i4, <i4")[0]
    assert int(hdr[1]) == 41
    assert int(hdr[2]) == 4 and int(hdr[3]) == 2
    voc2 = load_dbow2_binary(p)
    assert voc2.n_words == voc.n_words
    np.testing.assert_allclose(voc2.weights, voc.weights, rtol=1e-6)
    d = _pack_u32(random_descs(rng, 64))
    b1, w1, _ = voc.transform(d)
    b2, w2, _ = voc2.transform(d)
    assert (w1 == w2).all()
    assert abs(Vocabulary.score(b1, b2) - 1.0) < 1e-5


def test_feature_level_is_levelsup_from_leaves(rng):
    """DBoW2 parity: feature_level means `levelsup` counted UP FROM THE
    LEAVES, like the reference's transform(desc, bow, feat, 4) call
    (Frame.cc:713-720) and getParentNode(wid, levelsup)
    (TemplatedVocabulary.h:143-171) — NOT a depth from the root.  Built
    with a deep sparse k=10/L=6 tree (uneven, like the real ORBvoc)."""
    import dataclasses
    train = random_descs(rng, 3000)
    base = train_vocabulary(train, k=10, depth=6, seed=3)
    voc = dataclasses.replace(base, feature_level=4)

    # independent reference walk-up: parent pointers, 4 steps, stop at root
    n = len(voc.word_id)
    parent = np.full(n, 0, np.int64)
    for nid in range(n):
        for c in voc.children[nid]:
            if c >= 0:
                parent[c] = nid

    def get_parent_node(node, levelsup):
        while levelsup > 0 and node != 0:
            node = parent[node]
            levelsup -= 1
        return node

    word_nodes = np.nonzero(voc.word_id >= 0)[0]
    for wn in word_nodes[:: max(1, len(word_nodes) // 200)]:
        assert voc._group_of_node[wn] == get_parent_node(int(wn), 4)

    # the transform's fnodes are those group nodes (grouping ~100x coarser
    # than node-level-4-from-root on a deep vocabulary)
    d = _pack_u32(random_descs(rng, 256))
    _, wids, fnodes = voc.transform(d)
    groups = np.unique(fnodes)
    assert len(groups) < len(np.unique(wids)), \
        "grouping must be coarser than the words themselves"

    # SearchByBoW survives the deep vocabulary: identical descriptor sets
    # must still match nearly everywhere (with from-the-root semantics the
    # candidate sets collapse and recall dies)
    import jax.numpy as jnp
    from airdos_tpu.matching.bow_match import match_by_bow
    valid = jnp.ones(256, bool)
    ang = jnp.zeros(256, jnp.float32)
    res = match_by_bow(jnp.asarray(d), jnp.asarray(fnodes), valid, ang,
                       jnp.asarray(d), jnp.asarray(fnodes), valid, ang,
                       check_rotation=False)
    assert int(res.n_matches) > 200, int(res.n_matches)


def test_horn_align_se3(rng):
    xi = rng.uniform(-1, 1, 6).astype(np.float32)
    R_gt, t_gt = se3_exp(jnp.asarray(xi))
    P2 = rng.uniform(-3, 3, (30, 3)).astype(np.float32)
    P1 = (np.asarray(R_gt) @ P2.T).T + np.asarray(t_gt)
    R, t, s = horn_align(jnp.asarray(P1), jnp.asarray(P2), fix_scale=True)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_gt), atol=2e-3)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_gt), atol=5e-3)


def test_horn_align_sim3(rng):
    xi = rng.uniform(-0.5, 0.5, 6).astype(np.float32)
    R_gt, t_gt = se3_exp(jnp.asarray(xi))
    s_gt = 1.7
    P2 = rng.uniform(-3, 3, (25, 3)).astype(np.float32)
    P1 = s_gt * (np.asarray(R_gt) @ P2.T).T + np.asarray(t_gt)
    R, t, s = horn_align(jnp.asarray(P1), jnp.asarray(P2), fix_scale=False)
    assert abs(float(s) - s_gt) < 5e-3
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_gt), atol=2e-3)


def test_epnp_exact(rng):
    fx = fy = 500.0
    cx, cy = 320.0, 240.0
    xi = np.array([0.2, -0.1, 0.15, 0.05, -0.04, 0.08], np.float32)
    R_gt, t_gt = se3_exp(jnp.asarray(xi))
    pw = rng.uniform([-3, -2, 4], [3, 2, 15], (24, 3)).astype(np.float32)
    xc = (np.asarray(R_gt) @ pw.T).T + np.asarray(t_gt)
    uv = np.stack([fx * xc[:, 0] / xc[:, 2] + cx,
                   fy * xc[:, 1] / xc[:, 2] + cy], axis=1).astype(np.float32)
    R, t = epnp_pose(jnp.asarray(pw), jnp.asarray(uv),
                     jnp.ones(24, jnp.float32), fx, fy, cx, cy)
    # reprojection check
    xc2 = pw @ np.asarray(R).T + np.asarray(t)
    uv2 = np.stack([fx * xc2[:, 0] / xc2[:, 2] + cx,
                    fy * xc2[:, 1] / xc2[:, 2] + cy], axis=1)
    err = np.linalg.norm(uv2 - uv, axis=1)
    assert np.median(err) < 1.0, np.median(err)


def test_epnp_ransac_with_outliers(rng):
    fx = fy = 500.0
    cx, cy = 320.0, 240.0
    n = 60
    xi = np.array([0.1, 0.2, -0.1, 0.03, 0.05, -0.02], np.float32)
    R_gt, t_gt = se3_exp(jnp.asarray(xi))
    pw = rng.uniform([-3, -2, 4], [3, 2, 15], (n, 3)).astype(np.float32)
    xc = (np.asarray(R_gt) @ pw.T).T + np.asarray(t_gt)
    uv = np.stack([fx * xc[:, 0] / xc[:, 2] + cx,
                   fy * xc[:, 1] / xc[:, 2] + cy], axis=1).astype(np.float32)
    uv += rng.normal(0, 0.5, uv.shape)
    out = rng.choice(n, n // 3, replace=False)
    uv[out] += rng.uniform(30, 80, (len(out), 2)) * rng.choice([-1, 1], (len(out), 2))

    H = 128
    samples = rng.integers(0, n, (H, 4)).astype(np.int32)
    res = epnp_ransac(jnp.asarray(pw), jnp.asarray(uv), jnp.ones(n, bool),
                      jnp.full(n, 5.991 * 4.0, jnp.float32),
                      jnp.asarray(samples), fx, fy, cx, cy)
    inl = np.asarray(res.inliers)
    assert int(res.n_inliers) > n // 2
    assert (~inl[out]).mean() > 0.85
    # pose close to GT
    dR = np.asarray(res.R) @ np.asarray(R_gt).T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 2.0, ang
    assert np.linalg.norm(np.asarray(res.t) - np.asarray(t_gt)) < 0.3
