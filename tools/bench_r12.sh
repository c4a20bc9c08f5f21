#!/bin/bash
# Round-12 serialized bench pipeline. One JVM at a time; status lines to
# target/bench_r12_status.txt; ALL_DONE marker when finished.
set -u
cd /root/repo
S=target/bench_r12_status.txt
echo "start $(date -u +%H:%M:%S)" > $S
X=/root/repo/target/scale_suite

step() { echo "$1 $(date -u +%H:%M:%S)" >> $S; }

# 1. full suite at sf0.1 (artifact of record)
step "suite_1x:begin"
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_OUT=BENCH_full.json \
  sbt -batch "runMain graft.Bench" > target/bench_1x.out 2>target/bench_1x.err
step "suite_1x:done rc=$?"

# 2. cluster 1x (multi-JVM certification point)
step "cluster_1x:begin"
SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  SPARK_GRAFT_MASTER='local-cluster[4,8,4096]' SPARK_DRIVER_MEM=24g \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_OUT=BENCH_cluster.json \
  sbt -batch "runMain graft.Bench" > target/bench_cl1.out 2>target/bench_cl1.err
step "cluster_1x:done rc=$?"

# 3. cluster x10 (NEW: forked executors at a scaled point)
step "cluster_x10:begin"
SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  SPARK_GRAFT_MASTER='local-cluster[4,8,8192]' SPARK_GRAFT_EXEC_MEM=8g \
  SPARK_DRIVER_MEM=24g \
  SPARK_GRAFT_SF_DIR=$X/_root_testdata_sf0.1_x10 \
  SPARK_GRAFT_BENCH_OUT=BENCH_cluster_x10.json \
  sbt -batch "runMain graft.Bench" > target/bench_cl10.out 2>target/bench_cl10.err
step "cluster_x10:done rc=$?"

# 4-6. local[32] scaled points
for N in 10 30 100; do
  step "sfx$N:begin"
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=$X/_root_testdata_sf0.1_x$N \
    SPARK_GRAFT_BENCH_OUT=BENCH_sfx$N.json \
    sbt -batch "runMain graft.Bench" > target/bench_x$N.out 2>target/bench_x$N.err
  step "sfx$N:done rc=$?"
done

# 7. q175 two-run confirm at x30 and x100 (VERDICT item 2)
for RUN in 1 2; do
  for N in 30 100; do
    step "q175_x${N}_run$RUN:begin"
    SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=$X/_root_testdata_sf0.1_x$N \
      SPARK_GRAFT_BENCH_ONLY=q175 \
      SPARK_GRAFT_BENCH_OUT=target/q175_x${N}_run$RUN.json \
      sbt -batch "runMain graft.Bench" > target/q175_x${N}_r$RUN.out 2>/dev/null
    step "q175_x${N}_run$RUN:done rc=$?"
  done
done

# 8. ScaleBench rows for the changed/new families at sf0.1 {1,10}
step "scalebench:begin"
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.ScaleBench 10 label_propagation fuzzy_ingest_steady" \
  > target/scalebench_r12.out 2>target/scalebench_r12.err
step "scalebench:done rc=$?"

echo "ALL_DONE $(date -u +%H:%M:%S)" >> $S
