#!/usr/bin/env bash
# Build the SLAM++ reference binary for parity validation (scripts/ref_parity.py).
#
# The reference tree at /root/reference is read-only by policy; its CMake
# hardwires runtime output into <source>/bin, so we build out-of-source and
# immediately relocate the artifacts out of the source tree.
set -euo pipefail
REF=${1:-/root/reference}
BUILD=${2:-/tmp/refbuild}
OUT=${3:-/tmp/refbin}

mkdir -p "$BUILD" "$OUT"
cd "$BUILD"
cmake "$REF" -DCMAKE_BUILD_TYPE=Release > cmake.log 2>&1
make slam_plus_plus -j"$(nproc)" > make.log 2>&1
# the Sim(3) BA app (3DV'17) — used by the sim3 ref-parity case
make incremental_ba_3dv -j"$(nproc)" >> make.log 2>&1 || true
# relocate artifacts the reference CMake wrote into its own source tree
if [ -d "$REF/bin" ]; then mv "$REF"/bin/* "$OUT"/ && rmdir "$REF/bin"; fi
if [ -d "$REF/lib" ]; then rm -rf "$OUT/lib" && mv "$REF/lib" "$OUT/lib"; fi
echo "reference binary: $OUT/slam_plus_plus"
"$OUT/slam_plus_plus" --help > /dev/null 2>&1 || true
