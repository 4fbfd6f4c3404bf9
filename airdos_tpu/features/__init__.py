from airdos_tpu.features.orb import OrbFeatures, OrbExtractor, level_quotas  # noqa: F401
