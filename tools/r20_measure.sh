#!/bin/bash
# Round-20 measurement session (run inside the `perf` tmux session so the
# JVMs survive tool-call exits). The st19 freeze changed shape in r20 (the
# pack census emits sequence cuts), so BOTH scales' per-phase freeze
# decompositions re-measure under the current shape — two runs per scale so
# the composite has a min to take; the freeze-only reps additionally yield
# the whole-freeze healthy-rep decade when the host grants clean windows.
# Then the full healthy-window bench over all 195 gate queries.
set -x
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"

java -Xmx100g -cp "$CP" graft.tools.Certify st19freeze 10 8 2 \
  > target/certify_freeze_x10.log 2>&1
java -Xmx100g -cp "$CP" graft.tools.Certify st19phases 10 8 \
  > target/certify_phases_x10.log 2>&1
java -Xmx100g -cp "$CP" graft.tools.Certify st19phases 10 8 \
  >> target/certify_phases_x10.log 2>&1
java -Xmx100g -cp "$CP" graft.tools.Certify st19freeze 100 8 2 \
  > target/certify_freeze_x100.log 2>&1
java -Xmx100g -cp "$CP" graft.tools.Certify st19phases 100 8 \
  > target/certify_phases_x100.log 2>&1
java -Xmx100g -cp "$CP" graft.tools.Certify st19phases 100 8 \
  >> target/certify_phases_x100.log 2>&1
python3 tools/merge_certify_r20.py

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_START_WAIT_ROUNDS=40 \
java -Xmx100g -cp "$CP" graft.Bench > target/bench_r20_run1.log 2>&1
echo DONE_R20_MEASURE
