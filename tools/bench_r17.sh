#!/bin/bash
# Round-17 serialized bench pipeline (the bench_r12.sh shape). One JVM at a
# time — the two-run host-interference protocol bans concurrent heavy work.
# Status lines to target/bench_r17_status.txt; ALL_DONE marker at the end.
set -u
cd /root/repo
S=target/bench_r17_status.txt
echo "start $(date -u +%H:%M:%S)" > $S
X=/root/repo/target/scale_suite

step() { echo "$1 $(date -u +%H:%M:%S)" >> $S; }

# 1. NEW image-lane ScaleBench families (verdict item 5): 1x/10x curves
step "image_families:begin"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.ScaleBench 10 image_neardup image_index_steady" \
  > target/scalebench_image.out 2>target/scalebench_image.err
step "image_families:done rc=$?"

# 2. x10 suite at HEAD, all 221 queries (verdict item 2)
step "suite_x10:begin"
SPARK_GRAFT_SF_DIR=$X/_root_testdata_sf0.1_x10 \
  SPARK_GRAFT_BENCH_OUT=BENCH_sfx10_r17.json \
  sbt -batch "runMain graft.Bench" > target/bench_x10.out 2>target/bench_x10.err
step "suite_x10:done rc=$?"

# 3. x100 single-JVM 64g at HEAD (verdict items 2+3)
step "suite_x100:begin"
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=$X/sf0.1_x100 \
  SPARK_GRAFT_BENCH_OUT=BENCH_sfx100_r17.json \
  sbt -batch "runMain graft.Bench" > target/bench_x100.out 2>target/bench_x100.err
step "suite_x100:done rc=$?"

# 4. x100 cluster 4x18g at HEAD (verdict items 2+3)
step "cluster_x100:begin"
SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  SPARK_GRAFT_MASTER='local-cluster[4,8,20480]' SPARK_GRAFT_EXEC_MEM=18g \
  SPARK_DRIVER_MEM=24g SPARK_GRAFT_SF_DIR=$X/sf0.1_x100 \
  SPARK_GRAFT_BENCH_OUT=BENCH_cluster_x100_r17.json \
  sbt -batch "runMain graft.Bench" > target/bench_clx100.out 2>target/bench_clx100.err
step "cluster_x100:done rc=$?"

# 5. sf0.1 settled pair at HEAD (two instrumented runs back-to-back)
step "pair_run1:begin"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=BENCH_r17_a.json \
  sbt -batch "runMain graft.Bench" > target/bench_pair1.out 2>target/bench_pair1.err
step "pair_run1:done rc=$?"
step "pair_run2:begin"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=BENCH_r17_b.json \
  sbt -batch "runMain graft.Bench" > target/bench_pair2.out 2>target/bench_pair2.err
step "pair_run2:done rc=$?"

step "ALL_DONE"
