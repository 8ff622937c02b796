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
# Full-set local-cluster smoke: every registered query once across REAL
# executor child JVMs (local-cluster[2,2,2048]) — catches closure-capture /
# classpath / codegen-visibility bugs that local[32] structurally cannot
# (round 8 found a relative-classpath bug this way on its first run).
# ClusterSmoke exits nonzero on any query failure; pipefail propagates it.
CS_CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
CS_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  CS_OPENS="$CS_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  java $CS_OPENS -Xmx4g -cp "$CS_CP" graft.tools.ClusterSmoke /root/testdata/sf0.001 2>/dev/null \
  | grep '\[clustersmoke\] total'
echo "[gate] local-cluster smoke ok"
# Bench contract smoke: both stdout JSON lines parse (a Bench crash would
# zero BENCH_r{N} exactly like round 2's compile error zeroed everything).
# Since r14 the bench prints TWO lines — the full per-query object and the
# driver-parseable family-rollup summary LAST — so validate each line on its
# own and require the last one to be the summary (unit "sec"), mirroring
# what the driver's 2 KiB stdout tail actually parses.
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '"metric"' | python3 -c '
import json, sys
lines = [l for l in sys.stdin.read().splitlines() if l.strip()]
assert len(lines) == 2, f"want 2 JSON lines (full + summary), got {len(lines)}"
objs = [json.loads(l[l.index("{"):]) for l in lines]
assert objs[-1]["unit"] == "sec", "summary line must be LAST"
assert len(json.dumps(objs[-1])) < 1500, "summary line must fit the driver tail"
print("[gate] bench JSON ok")'
echo "[gate] all green"
