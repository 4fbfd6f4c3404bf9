"""Golden-format regression for the SaveMap metadata dump.

Pins the column schema of the five Tracking::SaveMap files
(reference Tracking.cc:1752-1835: KF 9 columns `id ts x y z qx qy qz qw`
EDN-quaternion order, MP 4 columns `id x y z`, Match 6 columns
`pid kf_id u v uR invSigma2`, HMTraj 10 columns
`tid pose_idx joint ts x y z bad lost optimized`, Motion 13 columns
`tid r00..r22 t0 t1 t2`) — the ready-made regression schema SURVEY §4
prescribes.  Any column added/dropped/reordered breaks downstream
evaluation tooling silently; this test makes it loud.
"""
import numpy as np

from airdos_tpu.config import SlamConfig
from airdos_tpu.io.synthetic import SyntheticStereoWorld, small_camera
from airdos_tpu.slam.map import N_PARTS, HumanPose, HumanTrajectory
from airdos_tpu.slam.system import System


def _build_system(frames):
    cfg = SlamConfig()
    cfg.camera = small_camera()
    cfg.orb.n_features = 600
    cfg.orb.n_levels = 4
    cfg.system.is_offline = True
    cfg.device.max_keypoints = 1024
    cfg.device.max_local_kfs = 8
    cfg.device.max_fixed_kfs = 4
    cfg.device.max_local_points = 1024
    cfg.device.max_ba_edges = 4096
    slam = System(cfg)
    for data, _, _ in frames:
        slam.track_stereo(data)
    return slam


def _inject_trajectory(slam):
    """A synthetic human trajectory so HMTraj/Motion are non-empty."""
    rng = np.random.default_rng(0)
    traj = HumanTrajectory(track_id=7)
    kf_id = min(slam.map.kfs)
    for i in range(3):
        joints = rng.uniform(-1, 1, (18, 3)).astype(np.float32)
        traj.add_pose(HumanPose(
            track_id=7, timestamp=0.1 * i, kf_id=kf_id,
            joints_w=joints, bad=np.zeros(18, bool),
            lost=np.zeros(18, bool), optimized=np.ones(18, bool)))
    traj.motion_t = np.array([0.1, 0.0, -0.2], np.float32)
    slam.map.trajectories[7] = traj


def _rows(path):
    return [ln.split() for ln in path.read_text().splitlines() if ln.strip()]


def test_savemap_dump_schema(tmp_path):
    world = SyntheticStereoWorld(seed=0, n_points=200, cam=small_camera())
    frames = list(world.sequence(8, dt=0.1, yaw_rate=0.008))
    slam = _build_system(frames)
    _inject_trajectory(slam)
    out = tmp_path / "dump"
    slam.before_end(out)
    slam.shutdown()

    kf = _rows(out / "KF.txt")
    assert len(kf) >= 1
    assert all(len(r) == 9 for r in kf), "KF.txt: id ts x y z qx qy qz qw"
    ids = [int(r[0]) for r in kf]
    assert ids == sorted(ids), "KF rows ordered by id"
    for r in kf:
        q = np.asarray([float(x) for x in r[5:9]])
        assert abs(np.linalg.norm(q) - 1.0) < 1e-3, "unit quaternion, xyzw"

    mp = _rows(out / "MP.txt")
    assert len(mp) >= 10
    assert all(len(r) == 4 for r in mp), "MP.txt: id x y z"
    pids = [int(r[0]) for r in mp]
    assert pids == sorted(pids)

    match = _rows(out / "Match.txt")
    assert len(match) >= 10
    assert all(len(r) == 6 for r in match), \
        "Match.txt: pid kf_id u v uR invSigma2"
    mp_ids = set(pids)
    kf_ids = set(ids)
    for r in match:
        assert int(r[0]) in mp_ids
        assert int(r[1]) in kf_ids
        assert float(r[5]) > 0, "invSigma2 positive"

    hm = _rows(out / "HMTraj.txt")
    assert len(hm) == 3 * 18
    assert all(len(r) == 10 for r in hm), \
        "HMTraj.txt: tid pose joint ts x y z bad lost optimized"
    for r in hm:
        assert int(r[0]) == 7
        assert r[7] in "01" and r[8] in "01" and r[9] in "01"

    mo = _rows(out / "Motion.txt")
    assert len(mo) == 1
    assert len(mo[0]) == 13, "Motion.txt: tid r00..r22 t0 t1 t2"
    vals = np.asarray([float(x) for x in mo[0][1:]]).reshape(3, 4)
    np.testing.assert_allclose(vals[:, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(vals[:, 3], [0.1, 0.0, -0.2], atol=1e-6)
