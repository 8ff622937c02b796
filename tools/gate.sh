#!/usr/bin/env bash
# The un-skippable end-of-session gate (round 2 shipped a non-compiling HEAD
# and lost 40 green rows to one import): compile, full tests, Verify dump at
# sf0.01, DuckDB oracle compare. Exit nonzero on ANY failure.
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch compile
sbt -batch test
OUT=$(mktemp -d /tmp/gate_verify.XXXXXX)
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $OUT" > /dev/null
python3 tools/check.py /root/testdata/sf0.01 "$OUT"
echo "[gate] all green"
