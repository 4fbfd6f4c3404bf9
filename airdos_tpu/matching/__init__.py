from airdos_tpu.matching.stereo import stereo_match, stack_pyramid  # noqa: F401
