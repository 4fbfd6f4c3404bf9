"""The >=40-point ComputeSim3 acceptance gate (reference
LoopClosing.cc:350-390): a geometrically-consistent candidate whose loop
neighborhood projects fewer than 40 total matches must be REJECTED, and
the same candidate with a richer neighborhood must pass."""
import numpy as np

from airdos_tpu.config import SlamConfig
from airdos_tpu.io.synthetic import small_camera
from airdos_tpu.slam.loop_closing import LoopCloser
from airdos_tpu.slam.map import KeyFrame, SlamMap


class _Frame:
    def __init__(self, idx, n_slots, Rcw, tcw):
        self.index = idx
        self.timestamp = idx * 0.5
        self.xy = np.zeros((n_slots, 2), np.float32)
        self.xy_un = np.zeros((n_slots, 2), np.float32)
        self.octave = np.zeros(n_slots, np.int32)
        self.angle = np.zeros(n_slots, np.float32)
        self.response = np.ones(n_slots, np.float32)
        self.desc32 = np.zeros((n_slots, 8), np.uint32)
        self.u_right = np.full(n_slots, -1.0, np.float32)
        self.depth = np.full(n_slots, -1.0, np.float32)
        self.valid = np.ones(n_slots, bool)
        self.mp_idx = np.full(n_slots, -1, np.int64)
        self.Rcw = Rcw.astype(np.float32)
        self.tcw = tcw.astype(np.float32)


class _DummyVoc:
    def score(self, a, b):
        return 0.0


class _DummyDB:
    voc = _DummyVoc()

    def ensure_bow(self, kf):
        pass

    def add(self, kf):
        pass


class _Ext:
    scales = tuple(1.2 ** i for i in range(4))
    sigma2 = np.asarray([1.2 ** (2 * i) for i in range(4)], np.float32)


def _project(cam, pts, Rcw, tcw):
    xc = pts @ Rcw.T + tcw
    z = xc[:, 2]
    u = cam.fx * xc[:, 0] / z + cam.cx
    v = cam.fy * xc[:, 1] / z + cam.cy
    return np.stack([u, v], 1).astype(np.float32), (u - cam.bf / z), z


def _make_scene(rng, n_extra_neighbor_points):
    cfg = SlamConfig()
    cfg.camera = small_camera()
    cam = cfg.camera
    m = SlamMap()

    n_shared = 28
    n_extra = n_extra_neighbor_points
    n_slots = n_shared + n_extra
    eye = np.eye(3, dtype=np.float32)
    zero = np.zeros(3, np.float32)

    shared = np.stack([rng.uniform(-2.0, 2.0, n_shared),
                       rng.uniform(-1.2, 1.2, n_shared),
                       rng.uniform(4.0, 9.0, n_shared)], 1).astype(np.float32)
    extra = np.stack([rng.uniform(-2.0, 2.0, max(n_extra, 1)),
                      rng.uniform(-1.2, 1.2, max(n_extra, 1)),
                      rng.uniform(4.0, 9.0, max(n_extra, 1))],
                     1).astype(np.float32)[:n_extra]
    desc_shared = rng.integers(0, 2 ** 32, (n_shared, 8), dtype=np.uint32)
    desc_extra = rng.integers(0, 2 ** 32, (max(n_extra, 1), 8),
                              dtype=np.uint32)[:n_extra]

    def fill(fr, pts3, descs, base):
        uv, ur, z = _project(cam, pts3, fr.Rcw, fr.tcw)
        sl = slice(base, base + len(pts3))
        fr.xy[sl] = uv
        fr.xy_un[sl] = uv
        fr.u_right[sl] = ur
        fr.depth[sl] = z
        fr.desc32[sl] = descs

    # candidate KF (id 0) sees the shared points
    fr0 = _Frame(0, n_slots, eye, zero)
    fill(fr0, shared, desc_shared, 0)
    ckf = KeyFrame(0, fr0)
    m.add_keyframe(ckf)
    pids = m.create_points(ckf, np.arange(n_shared), shared)

    # optional covisible neighbor of the candidate carrying extra points
    if n_extra:
        fr1 = _Frame(1, n_slots, eye, np.asarray([0.3, 0, 0], np.float32))
        fill(fr1, extra, desc_extra, 0)
        nkf = KeyFrame(1, fr1)
        m.add_keyframe(nkf)
        m.create_points(nkf, np.arange(n_extra), extra)
        nkf.covis = {0: 150}
        ckf.covis = {1: 150}
        nkf.ordered_covis = [0]
        ckf.ordered_covis = [1]
        m.next_kf_id = 2

    # current KF (id 9): same pose as the candidate (perfect revisit) —
    # sees the shared points in its first slots and, crucially, has free
    # feature slots matching the neighbor's extra points
    fr9 = _Frame(9, n_slots, eye, zero)
    fill(fr9, shared, desc_shared, 0)
    if n_extra:
        fill(fr9, extra, desc_extra, n_shared)
    kf = KeyFrame(9, fr9)
    m.next_kf_id = 9
    m.add_keyframe(kf)
    m.next_kf_id = 10
    for j, pid in enumerate(pids):
        m.add_observation(int(pid), kf, j)

    # single-node BoW: brute-force matching inside compute_sim3
    for k in (kf, ckf):
        k.feat_nodes = np.zeros(n_slots, np.int32)
        k.bow = {}
    if n_extra:
        m.kfs[1].feat_nodes = np.zeros(n_slots, np.int32)
        m.kfs[1].bow = {}

    lc = LoopCloser(SlamConfig(camera=cam), m, _DummyDB(), _Ext())
    return lc, kf, ckf


def test_sparse_candidate_rejected_by_40_gate(rng):
    lc, kf, ckf = _make_scene(rng, n_extra_neighbor_points=0)
    # 28 geometrically-perfect matches — passes BoW/RANSAC/OptimizeSim3,
    # but the loop neighborhood cannot reach 40 total projections
    assert lc.compute_sim3(kf, ckf.id) is None


def test_rich_candidate_passes_40_gate(rng):
    lc, kf, ckf = _make_scene(rng, n_extra_neighbor_points=40)
    res = lc.compute_sim3(kf, ckf.id)
    assert res is not None
    R12, t12, s12, matches, cand_id, loop_points = res
    assert len(matches) >= 40
    np.testing.assert_allclose(R12, np.eye(3), atol=1e-3)
    np.testing.assert_allclose(t12, np.zeros(3), atol=5e-3)
