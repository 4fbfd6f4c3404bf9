"""Native C++ host runtime (optional).

Build with tools/build_native.sh; every caller has a numpy fallback."""
try:
    from airdos_tpu.native.airdos_native import (  # noqa: F401
        covisibility_counts, distinctive_descriptor, hamming_matrix_u8)
except ImportError:  # extension not built
    pass
