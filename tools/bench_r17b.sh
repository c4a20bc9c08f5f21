#!/bin/bash
# Round-17 close-out pipeline at final HEAD (222 queries): wide ScaleBench
# family, the settled sf0.1 pair FIRST (the artifact of record), then the
# scale points. Serialized — one JVM at a time.
set -u
cd /root/repo
S=target/bench_r17b_status.txt
echo "start $(date -u +%H:%M:%S)" > $S
X=/root/repo/target/scale_suite

step() { echo "$1 $(date -u +%H:%M:%S)" >> $S; }

step "wide_family:begin"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.ScaleBench 10 audio_neardup_wide" \
  > target/scalebench_wide.out 2>target/scalebench_wide.err
step "wide_family:done rc=$?"

step "pair_run1:begin"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=BENCH_full.json \
  sbt -batch "runMain graft.Bench" > target/bench_p1.out 2>target/bench_p1.err
step "pair_run1:done rc=$?"
step "pair_run2:begin"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=BENCH_r17_confirm.json \
  sbt -batch "runMain graft.Bench" > target/bench_p2.out 2>target/bench_p2.err
step "pair_run2:done rc=$?"

step "suite_x10:begin"
SPARK_GRAFT_SF_DIR=$X/_root_testdata_sf0.1_x10 \
  SPARK_GRAFT_BENCH_OUT=BENCH_sfx10_r17.json \
  sbt -batch "runMain graft.Bench" > target/bench_x10b.out 2>target/bench_x10b.err
step "suite_x10:done rc=$?"

step "suite_x100:begin"
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=$X/sf0.1_x100 \
  SPARK_GRAFT_BENCH_OUT=BENCH_sfx100_r17.json \
  sbt -batch "runMain graft.Bench" > target/bench_x100b.out 2>target/bench_x100b.err
step "suite_x100:done rc=$?"

step "cluster_x100:begin"
SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  SPARK_GRAFT_MASTER='local-cluster[4,8,20480]' SPARK_GRAFT_EXEC_MEM=18g \
  SPARK_DRIVER_MEM=24g SPARK_GRAFT_SF_DIR=$X/sf0.1_x100 \
  SPARK_GRAFT_BENCH_OUT=BENCH_cluster_x100_r17.json \
  sbt -batch "runMain graft.Bench" > target/bench_clx100b.out 2>target/bench_clx100b.err
step "cluster_x100:done rc=$?"

step "ALL_DONE"
