from airdos_tpu.ops.filters import gaussian_blur7, erode, resize_bilinear  # noqa: F401
from airdos_tpu.ops.pyramid import build_pyramid, PYRAMID_EDGE  # noqa: F401
from airdos_tpu.ops.fast import fast_score_map  # noqa: F401
from airdos_tpu.ops.orientation import ic_angle_maps, sample_angles  # noqa: F401
from airdos_tpu.ops.brief import compute_descriptors, load_pattern  # noqa: F401
from airdos_tpu.ops.hamming import hamming_matrix, hamming_distance  # noqa: F401
