#!/usr/bin/env bash
# Build the native kern tools into piano_a2s_tpu/symbolic/libkern_tools.so
set -euo pipefail
cd "$(dirname "$0")"
mkdir -p build
cd build
cmake .. -DCMAKE_BUILD_TYPE=Release >/dev/null
make -s
echo "built: $(ls ../../piano_a2s_tpu/symbolic/libkern_tools.so)"
