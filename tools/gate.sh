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
# Bench contract smoke: one parseable JSON line (a Bench crash would zero
# BENCH_r{N} exactly like round 2's compile error zeroed everything)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '"metric"' | python3 -c 'import json,sys; s=sys.stdin.read(); json.loads(s[s.index("{"):]); print("[gate] bench JSON ok")'
echo "[gate] all green"
