#!/usr/bin/env bash
# ThreadSanitizer CI for the native host runtime (SURVEY.md §5.2: the
# reference ships no race detection; the rebuild's host threading runs
# under TSAN here). Builds tandem_native.cpp + the stress harness with
# -fsanitize=thread and fails on any reported race.
#
# Usage: scripts/tsan_check.sh   (exits non-zero on race / functional error)
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=$(mktemp -d /tmp/tandem_tsan.XXXXXX)
trap 'rm -rf "$OUT"' EXIT

CXXFLAGS="-O1 -g -std=c++17 -pthread -fsanitize=thread"
SRC="native/tandem_native.cpp native/tsan_stress.cpp"

# Prefer the OpenCV build (exercises the PrefetchLoader's decode thread);
# fall back to the codec-free build like native_bridge._compile does.
if g++ $CXXFLAGS -DTANDEM_WITH_OPENCV -I/usr/include/opencv4 $SRC \
       -o "$OUT/tsan_stress" -lopencv_imgcodecs -lopencv_core 2>"$OUT/cc.log"
then
  echo "tsan build: with OpenCV loader"
else
  g++ $CXXFLAGS $SRC -o "$OUT/tsan_stress"
  echo "tsan build: codec-free fallback"
fi

TSAN_OPTIONS="halt_on_error=1 exitcode=66" "$OUT/tsan_stress"
echo "TSAN: no races detected"
