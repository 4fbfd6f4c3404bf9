from airdos_tpu.parallel.sharded_ba import (  # noqa: F401
    make_mesh, sharded_pose_optimize_step, sharded_local_bundle_adjust,
)
