from airdos_tpu.geometry.se3 import (  # noqa: F401
    so3_exp, so3_log, so3_hat, quat_to_rot, rot_to_quat,
    se3_exp, se3_log, se3_compose, se3_inverse, se3_apply, se3_identity,
    sim3_compose, sim3_inverse, sim3_apply, sim3_identity, sim3_exp, sim3_log,
)
from airdos_tpu.geometry.camera import StereoCamera  # noqa: F401
