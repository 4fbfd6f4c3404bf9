#!/bin/sh
# Build the airdos_native CPython extension in place.
set -e
cd "$(dirname "$0")/.."
PY_INC=$(python -c "import sysconfig; print(sysconfig.get_paths()['include'])")
NP_INC=$(python -c "import numpy; print(numpy.get_include())")
EXT_SUFFIX=$(python -c "import sysconfig; print(sysconfig.get_config_var('EXT_SUFFIX'))")
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    -I"$PY_INC" -I"$NP_INC" \
    airdos_tpu/native/airdos_native.cpp \
    -o "airdos_tpu/native/airdos_native${EXT_SUFFIX}"
echo "built airdos_tpu/native/airdos_native${EXT_SUFFIX}"
