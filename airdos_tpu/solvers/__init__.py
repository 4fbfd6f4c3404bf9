from airdos_tpu.solvers.pose_opt import pose_optimize, PoseOptResult  # noqa: F401
