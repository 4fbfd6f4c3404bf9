"""ORBvoc-scale vocabulary: loading and place recognition at ~10^5-10^6
nodes (the reference ships a ~1.1M-node k=10/L=6 ORBvoc.txt and loads it
as the one big startup cost, System.cc:134-139,
Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h loadFromTextFile)."""
import time

import numpy as np
import pytest

from airdos_tpu.bow.vocabulary import (Vocabulary, load_dbow2_text,
                                       save_dbow2_binary, load_dbow2_binary)


def _synth_tree(k: int, depth: int, seed: int = 0):
    """A complete k-ary DBoW2-order tree with hierarchically-consistent
    random descriptors (children = parent with a few random bit flips, so
    the greedy Hamming descent is meaningful).  Returns (parents [n-1],
    descs_u8 [n-1, 32], weights [n-1], leaf [n-1]) in node-id order."""
    rng = np.random.default_rng(seed)
    level_sizes = [k ** (l + 1) for l in range(depth)]
    n = 1 + sum(level_sizes)
    descs = np.zeros((n, 32), np.uint8)
    parents = np.zeros(n - 1, np.int64)
    start = 1
    prev_start, prev_size = 0, 1
    flips = 64
    for l, size in enumerate(level_sizes):
        ids = np.arange(start, start + size)
        par = prev_start + (ids - start) // k
        parents[ids - 1] = par
        d = descs[par].copy()
        # flip `flips` random bits per child
        rows = np.repeat(np.arange(size), flips)
        bits = rng.integers(0, 256, size * flips)
        d.reshape(size, 32)[rows, bits // 8] ^= (1 << (bits % 8)).astype(np.uint8)
        descs[ids] = d
        prev_start, prev_size = start, size
        start += size
        flips = max(4, flips // 2)
    leaf = np.zeros(n - 1, bool)
    leaf[-level_sizes[-1]:] = True
    weights = np.where(leaf, rng.uniform(0.1, 2.0, n - 1), 0.0)
    return parents, descs[1:], weights.astype(np.float32), leaf


def _write_dbow2_text(path, k, depth, parents, descs, weights, leaf):
    cols = np.concatenate([parents[:, None].astype(np.float64),
                           leaf[:, None].astype(np.float64),
                           descs.astype(np.float64),
                           weights[:, None].astype(np.float64)], axis=1)
    with open(path, "w") as f:
        f.write(f"{k} {depth} 0 0\n")
        np.savetxt(f, cols,
                   fmt="%d %d" + " %d" * 32 + " %.6g")


@pytest.fixture(scope="module")
def big_voc(tmp_path_factory):
    """k=10 / L=5 tree: 111,110 nodes, 100,000 words — above the 10^5-node
    bar; the structure (k, levelsup grouping, text format) is exactly the
    ORBvoc's."""
    k, depth = 10, 5
    tmp = tmp_path_factory.mktemp("voc")
    path = tmp / "bigvoc.txt"
    _write_dbow2_text(path, k, depth, *_synth_tree(k, depth))
    t0 = time.perf_counter()
    voc = load_dbow2_text(path)
    load_s = time.perf_counter() - t0
    return voc, path, load_s


def test_scale_load_time(big_voc):
    voc, path, load_s = big_voc
    assert len(voc.word_id) == 111_111
    assert voc.n_words == 100_000
    assert load_s < 30.0, f"text load took {load_s:.1f}s"
    # the one-time sidecar cache exists and loads fast
    cache = path.with_suffix(path.suffix + ".npz")
    assert cache.exists()
    t0 = time.perf_counter()
    voc2 = load_dbow2_text(path)
    cached_s = time.perf_counter() - t0
    assert cached_s < 5.0
    assert np.array_equal(voc2.node_desc32, voc.node_desc32)
    assert np.array_equal(voc2.children, voc.children)
    assert np.array_equal(voc2.word_id, voc.word_id)


def test_scale_structure(big_voc):
    """Tree invariants at scale: every non-leaf has exactly k children,
    every leaf has a word id, the group table points feature_level
    ancestors up."""
    voc, _, _ = big_voc
    n_children = (voc.children >= 0).sum(axis=1)
    is_leaf = voc.word_id >= 0
    assert (n_children[~is_leaf] == voc.k).all()
    assert (n_children[is_leaf] == 0).all()
    # levelsup-from-leaves grouping: with L=5, levelsup=4 groups at the
    # children-of-root level -> at most 1 + k distinct groups
    groups = np.unique(voc._group_of_node[is_leaf])
    assert len(groups) <= 1 + voc.k


def test_scale_transform_and_retrieval(big_voc):
    """Transform 1536 descriptors through the 111k-node tree; identical
    descriptors map to identical words, and the inverted-file reloc
    retrieval finds the right keyframe at scale."""
    voc, _, _ = big_voc
    rng = np.random.default_rng(1)
    # build three synthetic "keyframes" from leaf-node descriptors
    leaves = np.nonzero(voc.word_id >= 0)[0]
    kf_descs = []
    for s in range(3):
        sel = rng.choice(len(leaves), 500, replace=False)
        kf_descs.append(voc.node_desc32[leaves[sel]])

    t0 = time.perf_counter()
    bows = [voc.transform(d)[0] for d in kf_descs]
    transform_s = (time.perf_counter() - t0) / 3
    assert transform_s < 10.0, f"transform took {transform_s:.1f}s/frame"
    for bow in bows:
        assert len(bow) > 100          # distinct words hit
        assert abs(sum(bow.values()) - 1.0) < 1e-4

    # identical query -> identical words; self-score dominates cross-score
    assert Vocabulary.score(bows[0], bows[0]) > 0.99
    assert Vocabulary.score(bows[0], bows[1]) < 0.2

    # inverted-file retrieval with duck-typed keyframes
    from airdos_tpu.slam.keyframe_db import KeyFrameDatabase
    from airdos_tpu.slam.map import SlamMap

    class StubKF:
        def __init__(self, kid, desc32):
            self.id = kid
            self.desc32 = desc32
            self.valid = np.ones(len(desc32), bool)
            self.bad = False
            self.covis = {}
            self.bow = None
            self.word_ids = None
            self.feat_nodes = None

        def best_covisible(self, n):
            return []

    m = SlamMap()
    db = KeyFrameDatabase(voc, m)
    for i, d in enumerate(kf_descs):
        kf = StubKF(i, d)
        m.kfs[i] = kf
        db.add(kf)
    # query with a noisy copy of KF1's descriptors (flip a few bits)
    q = kf_descs[1].copy()
    qb = q.view(np.uint8).reshape(len(q), 32).copy()
    rows = rng.integers(0, len(q), 300)
    bits = rng.integers(0, 256, 300)
    qb[rows, bits // 8] ^= (1 << (bits % 8)).astype(np.uint8)
    bow_q, _, _ = voc.transform(qb.view(np.uint32).reshape(len(q), 8))
    cands = db.detect_reloc_candidates(bow_q)
    assert cands and cands[0] == 1


def test_scale_binary_roundtrip(big_voc, tmp_path):
    """The binary writer/loader round-trips the 111k-node tree."""
    voc, _, _ = big_voc
    p = tmp_path / "bigvoc.bin"
    save_dbow2_binary(voc, p)
    voc2 = load_dbow2_binary(p)
    assert np.array_equal(voc2.node_desc32, voc.node_desc32)
    assert np.array_equal(voc2.word_id, voc.word_id)
    assert np.allclose(voc2.weights, voc.weights, atol=1e-6)


@pytest.mark.slow
def test_full_orbvoc_scale(tmp_path):
    """Full ORBvoc scale: k=10 / L=6 = 1,111,111 nodes / 10^6 words —
    the exact shape of the reference's 145 MB ORBvoc.txt.  Asserts the
    <30 s load bar and a working transform."""
    k, depth = 10, 6
    path = tmp_path / "orbvoc_synth.txt"
    _write_dbow2_text(path, k, depth, *_synth_tree(k, depth))
    t0 = time.perf_counter()
    voc = load_dbow2_text(path)
    load_s = time.perf_counter() - t0
    assert len(voc.word_id) == 1_111_111
    assert voc.n_words == 1_000_000
    assert load_s < 30.0, f"text load took {load_s:.1f}s"
    rng = np.random.default_rng(0)
    q = voc.node_desc32[np.nonzero(voc.word_id >= 0)[0][
        rng.choice(10 ** 6, 1000, replace=False)]]
    t0 = time.perf_counter()
    bow, wids, fnodes = voc.transform(q)
    transform_s = time.perf_counter() - t0
    assert len(bow) > 100
    assert transform_s < 60.0
    print(f"orbvoc-scale: load {load_s:.1f}s, transform {transform_s:.2f}s")
