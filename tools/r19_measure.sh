#!/bin/bash
# Round-19 measurement session (run inside the `perf` tmux session so the
# JVMs survive tool-call exits). Sequence: freeze certifications at x10 and
# x100 (state builds untimed, freeze reps insisted-healthy), the s1_s2
# 6-rep steady recertification, then the full healthy-window bench.
set -x
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"

java -Xmx100g -cp "$CP" graft.tools.Certify st19freeze 10 8 2 \
  > target/certify_freeze_x10.log 2>&1
java -Xmx100g -cp "$CP" graft.tools.Certify st19freeze 100 8 2 \
  > target/certify_freeze_x100.log 2>&1
java -Xmx100g -cp "$CP" graft.tools.Certify query s1_s2_ingest_roundtrip \
  /root/testdata/sf0.1 6 > target/certify_s1s2.log 2>&1
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_START_WAIT_ROUNDS=40 \
java -Xmx100g -cp "$CP" graft.Bench > target/bench_r19_run1.log 2>&1
echo DONE_R19_MEASURE
