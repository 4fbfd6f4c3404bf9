from airdos_tpu.utils.obs import (  # noqa: F401
    EventLog, Profiler, get_logger, span)
