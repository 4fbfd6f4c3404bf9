"""Human-trajectory BA: recover joints, limb lengths, and motion."""
import numpy as np
import jax.numpy as jnp

from airdos_tpu.solvers.human_ba import human_bundle_adjust, N_PARTS, TORSO

BODY1 = np.array([1, 1, 2, 3, 1, 5, 6, 2, 8, 9, 5, 11, 12, 1])
BODY2 = np.array([0, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 1])

SKEL = np.array([
    [0.00, -0.70, 0.00], [0.00, -0.50, 0.00], [-0.20, -0.50, 0.00],
    [-0.25, -0.25, 0.00], [-0.28, 0.00, 0.00], [0.20, -0.50, 0.00],
    [0.25, -0.25, 0.00], [0.28, 0.00, 0.00], [-0.12, 0.10, 0.00],
    [-0.14, 0.50, 0.00], [-0.15, 0.90, 0.00], [0.12, 0.10, 0.00],
    [0.14, 0.50, 0.00], [0.15, 0.90, 0.00],
], np.float32)


def build_problem(rng, C=4, P=80, T=1, L=6, joint_noise=0.05, obs_noise=0.5):
    fx = fy = 400.0
    cx, cy = 160.0, 120.0
    bf = 100.0
    dt = 0.5
    vel = np.array([0.4, 0.0, -0.2], np.float32)   # human velocity m/s

    # static cameras along x
    cam_R = np.tile(np.eye(3, dtype=np.float32), (C, 1, 1))
    cam_t = np.stack([np.array([-0.3 * c, 0, 0], np.float32) for c in range(C)])
    cam_fixed = np.zeros(C, bool)
    cam_fixed[:2] = True

    pts_gt = rng.uniform([-4, -3, 4], [4, 3, 20], (P, 3)).astype(np.float32)
    es_cam, es_pt, es_obs = [], [], []
    for c in range(C):
        xc = pts_gt + cam_t[c]
        z = xc[:, 2]
        u = fx * xc[:, 0] / z + cx
        v = fy * xc[:, 1] / z + cy
        for p in range(P):
            es_cam.append(c)
            es_pt.append(p)
            es_obs.append([u[p] + rng.normal(0, 0.3),
                           v[p] + rng.normal(0, 0.3),
                           u[p] - bf / z[p] + rng.normal(0, 0.3)])
    Es = len(es_cam)

    # human: neck walks at vel; joints = skeleton + base
    joints_gt = np.zeros((T, L, N_PARTS, 3), np.float32)
    jo_obs = np.zeros((T, L, N_PARTS, 3), np.float32)
    jo_cam = np.zeros((T, L), np.int32)
    base0 = np.array([0.5, 0.2, 8.0], np.float32)
    for l in range(L):
        base = base0 + vel * (l * dt)
        joints_gt[0, l] = SKEL + base
        c = l % C
        jo_cam[0, l] = c
        xc = joints_gt[0, l] + cam_t[c]
        z = xc[:, 2]
        u = fx * xc[:, 0] / z + cx
        v = fy * xc[:, 1] / z + cy
        jo_obs[0, l, :, 0] = u + rng.normal(0, obs_noise, N_PARTS)
        jo_obs[0, l, :, 1] = v + rng.normal(0, obs_noise, N_PARTS)
        jo_obs[0, l, :, 2] = u - bf / z + rng.normal(0, obs_noise, N_PARTS)

    seg_gt = np.linalg.norm(SKEL[BODY1] - SKEL[BODY2], axis=1)

    # noisy initialization
    joints0 = joints_gt + rng.normal(0, joint_noise, joints_gt.shape).astype(np.float32)
    seg0 = np.linalg.norm(joints0[0, 0, BODY1] - joints0[0, 0, BODY2], axis=1)[None].astype(np.float32)
    pose_dt = np.full((T, L), dt, np.float32)
    return dict(
        fx=fx, fy=fy, cx=cx, cy=cy, bf=bf,
        cam_R=cam_R, cam_t=cam_t, cam_fixed=cam_fixed,
        pts_gt=pts_gt, es_cam=np.asarray(es_cam, np.int32),
        es_pt=np.asarray(es_pt, np.int32), es_obs=np.asarray(es_obs, np.float32),
        joints_gt=joints_gt, joints0=joints0, seg_gt=seg_gt, seg0=seg0,
        jo_cam=jo_cam, jo_obs=jo_obs, pose_dt=pose_dt, vel=vel, T=T, L=L, P=P, Es=Es)


def run_ba(pr, joints0, seg0, mot_t0=None, motion_valid=True,
           rigidity_valid=True, use_huber=True):
    T, L, P, Es = pr["T"], pr["L"], pr["P"], pr["Es"]
    ones = np.ones((T, L, N_PARTS), bool)
    res = human_bundle_adjust(
        jnp.asarray(pr["cam_R"]), jnp.asarray(pr["cam_t"]), jnp.asarray(pr["cam_fixed"]),
        jnp.asarray(pr["pts_gt"] + 0.05 * np.random.default_rng(1).standard_normal((P, 3)).astype(np.float32)),
        jnp.ones(P, bool),
        jnp.asarray(pr["es_cam"]), jnp.asarray(pr["es_pt"]), jnp.asarray(pr["es_obs"]),
        jnp.ones(Es, jnp.float32), jnp.ones(Es, bool),
        jnp.asarray(joints0), jnp.asarray(ones),
        jnp.asarray(pr["jo_cam"]), jnp.asarray(pr["jo_obs"]), jnp.asarray(ones),
        jnp.asarray(seg0), jnp.full((T, N_PARTS), rigidity_valid, bool),
        jnp.full((T, L, N_PARTS), rigidity_valid, bool),
        jnp.tile(jnp.eye(3, dtype=jnp.float32), (T, 1, 1)),
        jnp.zeros((T, 3), jnp.float32) if mot_t0 is None else jnp.asarray(mot_t0),
        jnp.ones(T, bool),
        jnp.asarray(pr["pose_dt"]),
        jnp.full((T, L, 5), motion_valid, bool),
        1.0, 0.5, 20.0, 20.0,       # sigma static/human/rigidity/motion
        1.0, 4.0, 1.0,              # thHuberMotion, thRanSacMotion, thRanSacRigidity
        pr["fx"], pr["fy"], pr["cx"], pr["cy"], pr["bf"],
        use_huber=use_huber)
    return res


def test_is_huber_flag_gates_phase1_robustness(rng):
    """Optimizer.IsHuber parity (reference Tracking.cc:150 reads the flag;
    the human-BA edges only install RobustKernelHuber when it is set):
    with a gross outlier observation, the Huber phase-1 run must recover
    the joints better than the plain-chi2 run, and the two runs must
    actually differ."""
    pr = build_problem(rng)
    jo = pr["jo_obs"].copy()
    jo[0, 2, 5, 0] += 400.0          # gross u outlier on one joint
    jo[0, 2, 5, 1] += 300.0
    pr = dict(pr, jo_obs=jo)
    res_h = run_ba(pr, pr["joints0"], pr["seg0"], use_huber=True)
    res_p = run_ba(pr, pr["joints0"], pr["seg0"], use_huber=False)
    j_h = np.asarray(res_h.joints)[0, : pr["L"]]
    j_p = np.asarray(res_p.joints)[0, : pr["L"]]
    assert not np.allclose(j_h, j_p), "IsHuber flag must change the solve"
    err_h = np.linalg.norm(j_h - pr["joints_gt"][0], axis=-1).mean()
    err_p = np.linalg.norm(j_p - pr["joints_gt"][0], axis=-1).mean()
    assert err_h < err_p, (err_h, err_p)


def test_human_ba_recovers_joints_and_segments(rng):
    """The AirDOS claim: rigidity + constant-velocity priors reduce joint
    error below what per-pose stereo triangulation alone achieves (depth
    noise sigma_z = z^2 sigma_d / bf ~ 0.13 m here)."""
    pr = build_problem(rng, obs_noise=0.2)
    res_proj = run_ba(pr, pr["joints0"], pr["seg0"], motion_valid=False,
                      rigidity_valid=False)
    jerr_proj = np.linalg.norm(np.asarray(res_proj.joints) - pr["joints_gt"], axis=-1)
    res = run_ba(pr, pr["joints0"], pr["seg0"])
    jerr = np.linalg.norm(np.asarray(res.joints) - pr["joints_gt"], axis=-1)
    assert np.median(jerr) < np.median(jerr_proj), (np.median(jerr), np.median(jerr_proj))
    assert np.median(jerr) < 0.12, np.median(jerr)
    serr = np.abs(np.asarray(res.seg_len)[0] - pr["seg_gt"])
    assert np.median(serr) < 0.05, (np.asarray(res.seg_len)[0], pr["seg_gt"])
    # motion velocity recovered (p2 = H p1 => t_H ~ vel)
    vel_est = np.asarray(res.mot_t)[0]
    assert np.linalg.norm(vel_est - pr["vel"]) < 0.12, (vel_est, pr["vel"])
    assert np.asarray(res.key_inlier).mean() > 0.9
    assert np.asarray(res.motion_inlier).mean() > 0.9


def test_human_ba_flags_broken_motion(rng):
    """A teleporting joint should be flagged as a motion outlier."""
    pr = build_problem(rng)
    joints0 = pr["joints0"].copy()
    res = run_ba(pr, joints0, pr["seg0"])
    base_inl = np.asarray(res.motion_inlier).mean()
    # corrupt the observations of pose 3's torso joint 1 (teleport)
    pr2 = build_problem(rng)
    pr2["jo_obs"][0, 3, 1, :] += np.array([40.0, 25.0, 40.0])
    res2 = run_ba(pr2, pr2["joints0"], pr2["seg0"])
    # torso joint 1 is TORSO[0]: its motion edges into and out of pose 3
    # must be flagged (-> bIsLost semantics, Optimizer.cc:2076-2086)
    mi = np.asarray(res2.motion_inlier)   # [T, L-1, 5]
    assert not mi[0, 2, 0] or not mi[0, 3, 0]
    # rigidity of the teleported joint's segments flagged too
    ri = np.asarray(res2.rigid_inlier)
    assert ri.mean() > 0.5   # most segments stay fine


def test_human_ba_rigidity_improves_bad_joint(rng):
    """With a missing (high-noise) observation, rigidity + motion priors
    should keep the joint near its true position."""
    pr = build_problem(rng, obs_noise=0.3)
    joints0 = pr["joints0"].copy()
    # joint (pose 2, part 4 = r wrist): no reliable obs -> huge noise obs
    pr["jo_obs"][0, 2, 4, :2] += 30.0
    res = run_ba(pr, joints0, pr["seg0"])
    # a single stereo observation is exactly solvable, so the corrupted
    # joint fits it; the inconsistency surfaces as a rejected RIGIDITY edge
    # for the elbow->wrist segment (index 3: BODY1=3, BODY2=4) at pose 2 —
    # the reference's bIsBad marking (Optimizer.cc:2090-2105)
    assert not np.asarray(res.rigid_inlier)[0, 2, 3]
    # other poses' wrist segments stay consistent
    ri = np.asarray(res.rigid_inlier)[0, :, 3]
    assert ri.sum() >= ri.shape[0] - 2


def test_window_trajectory_selection_prefers_current_tracks():
    """With more humans than max_trajectories slots, the CURRENTLY-visible
    trajectories must win over stale ones (reference collects the local
    window's observed trajectories, Optimizer.cc:1500-1538) — dict order
    would keep the oldest tracks forever."""
    import numpy as np
    from airdos_tpu.slam.ba_driver import select_window_trajectories
    from airdos_tpu.slam.map import HumanPose, HumanTrajectory

    def mk_traj(tid, kf_ids):
        tr = HumanTrajectory(tid)
        for k in kf_ids:
            j = np.zeros((18, 3), np.float32)
            tr.add_pose(HumanPose(track_id=tid, timestamp=float(k),
                                  kf_id=k, joints_w=j,
                                  bad=np.zeros(18, bool),
                                  lost=np.zeros(18, bool),
                                  optimized=np.zeros(18, bool)))
        return tr

    trajectories = {}
    # 6 stale tracks observed early (kf 0-5), inserted FIRST in dict order
    for tid in range(6):
        trajectories[tid] = mk_traj(tid, [0, 1, 2, 3, 4, 5])
    # 3 current tracks observed in the recent window (kf 10-14)
    for tid in range(100, 103):
        trajectories[tid] = mk_traj(tid, [10, 11, 12, 13, 14])
    # a too-short track is never selected even if current
    trajectories[999] = mk_traj(999, [14])

    window = set(range(3, 15))          # local window sees both groups
    got = select_window_trajectories(trajectories, window, 4)
    got_ids = [t.track_id for t in got]
    assert len(got_ids) == 4
    # all three current tracks selected, most-recent first
    assert set(got_ids[:3]) == {100, 101, 102}
    assert 999 not in got_ids
    # remaining slot goes to a stale track, not beyond the cap
    assert got_ids[3] in range(6)

    # window that sees only stale tracks still returns them
    got2 = select_window_trajectories(trajectories, {4, 5}, 8)
    assert len(got2) == 6


def test_human_local_ba_driver_end_to_end():
    """HumanLocalBA.__call__ on a hand-built map: exercises the slot-table
    edge assembly, trajectory windowing, device solve, and write-back in
    the FAST tier (the image-level pipeline tests that also reach this
    code are slow-marked, which once let an assembly-path regression
    through the dev loop).  Reference protocol:
    Optimizer::LocalBundleAdjustmentHumanTrajactory (Optimizer.cc:1496)."""
    import types
    from airdos_tpu.config import SlamConfig
    from airdos_tpu.io.synthetic import small_camera
    from airdos_tpu.slam.ba_driver import HumanLocalBA
    from airdos_tpu.slam.map import HumanPose, HumanTrajectory, KeyFrame, SlamMap

    rng = np.random.default_rng(7)
    cfg = SlamConfig()
    cfg.camera = small_camera()
    cfg.device.max_local_points = 256
    cfg.device.max_ba_edges = 1024
    cfg.device.max_trajectories = 2
    cfg.device.max_trajectory_len = 8
    cam = cfg.camera
    fx, fy, cx, cy, bf = cam.fx, cam.fy, cam.cx, cam.cy, cam.bf

    P = 60
    pts = np.stack([rng.uniform(-3, 3, P), rng.uniform(-2, 2, P),
                    rng.uniform(4, 12, P)], axis=1).astype(np.float32)

    def make_kf(m, kf_id, tcw, t):
        xc = pts + tcw[None, :]
        z = xc[:, 2]
        u = fx * xc[:, 0] / z + cx
        v = fy * xc[:, 1] / z + cy
        f = types.SimpleNamespace(
            index=kf_id, timestamp=t,
            Rcw=np.eye(3, dtype=np.float32),
            tcw=np.asarray(tcw, np.float32),
            xy=np.stack([u, v], 1).astype(np.float32),
            xy_un=np.stack([u, v], 1).astype(np.float32),
            octave=np.zeros(P, np.int32),
            angle=np.zeros(P, np.float32),
            response=np.ones(P, np.float32),
            desc32=rng.integers(0, 2 ** 32, (P, 8), dtype=np.uint32),
            u_right=(u - bf / z).astype(np.float32),
            depth=z.astype(np.float32),
            valid=np.ones(P, bool),
            mp_idx=np.full(P, -1, np.int32))
        kf = KeyFrame(kf_id, f)
        m.add_keyframe(kf)
        return kf

    m = SlamMap()
    kf0 = make_kf(m, 0, np.zeros(3, np.float32), 0.0)
    kf1 = make_kf(m, 1, np.array([0.1, 0.0, -0.2], np.float32), 0.5)
    pids = m.create_points(kf0, np.arange(P), pts)
    for fid in range(P):
        m.add_observation(int(pids[fid]), kf1, fid)
    kf0.ordered_covis = [1]
    kf1.ordered_covis = [0]
    kf0.covis = {1: P}
    kf1.covis = {0: P}

    # a walking human observed from both KFs (5 poses > TH_LONG_TRAJECTORY)
    base = np.array([0.5, 0.0, 6.0], np.float32)
    vel = np.array([0.3, 0.0, 0.0], np.float32)
    traj = HumanTrajectory(track_id=0)
    for i in range(5):
        t = 0.25 * i
        j = np.zeros((18, 3), np.float32)
        j[:14] = SKEL + base + vel * t
        kf = kf0 if t < 0.5 else kf1
        xc = j[:14] + kf.tcw[None, :]
        z = xc[:, 2]
        u = fx * xc[:, 0] / z + cx
        v = fy * xc[:, 1] / z + cy
        obs = np.full((18, 4), -1.0, np.float32)
        obs[:14, 0] = u + rng.normal(0, 0.3, 14)
        obs[:14, 1] = v + rng.normal(0, 0.3, 14)
        obs[:14, 2] = u - bf / z + rng.normal(0, 0.3, 14)
        jw = j.copy()
        jw[:14] += rng.normal(0, 0.03, (14, 3)).astype(np.float32)
        traj.add_pose(HumanPose(
            track_id=0, timestamp=t, kf_id=kf.id, joints_w=jw,
            bad=np.zeros(18, bool), lost=np.zeros(18, bool),
            optimized=np.zeros(18, bool), obs_uvd=obs))
    m.trajectories[0] = traj

    class _Ext:
        sigma2 = np.asarray([1.2 ** (2 * i) for i in range(8)], np.float32)

    drv = HumanLocalBA(cfg, m, _Ext())
    drv(m, 1)

    assert traj.optimized
    assert traj.poses[0].optimized[:14].all()
    assert np.isfinite(traj.motion_t).all()
    # recovered walking velocity (x is well constrained; depth axis sits at
    # the stereo noise floor, see test_human_ba_recovers_joints_and_segments)
    assert abs(traj.motion_t[0] - vel[0]) < 0.15, traj.motion_t
    # the free KF pose stayed finite and close to its (already correct) init
    assert np.linalg.norm(m.kfs[1].tcw - np.array([0.1, 0, -0.2])) < 0.05
