#!/usr/bin/env bash
# Multi-JVM execution differential: run a representative query slice under
# local-cluster[2,2,1024] (two real executor processes) and under local[4],
# and require string-exact identical sorted rows. See
# src/main/scala/graft/MultiJvmSmoke.scala for what this proves.
set -euo pipefail
cd "$(dirname "$0")/.."
# the worker's ExecutorRunner locates Spark's jars via SPARK_HOME when the
# driver runs outside the spark-submit wrappers (sbt); the command builder
# additionally needs the scala version pinned or it scans for source-build
# directories and aborts ("Cannot find any build directories")
export SPARK_HOME="${SPARK_HOME:-/opt/spark}"
export SPARK_SCALA_VERSION="${SPARK_SCALA_VERSION:-2.13}"
# usage: tools/multijvm.sh [sfDir] [--all]
#   --all runs the FULL declared board (324 queries) instead of the
#   34-query mechanism slice — the per-round gate; the slice is the
#   fast per-change loop.
SF="${1:-/root/testdata/sf0.001}"
MODE="${2:-}"
sbt -batch -error "runMain graft.MultiJvmSmoke $SF $MODE" 2>&1 \
  | grep "\[multijvm\]"
# localCheckpoint fault drill: hard-kill one executor after materialize(),
# assert loud failure or retry-correct — never silent-wrong rows
sbt -batch -error "runMain graft.CheckpointFaultSmoke ${1:-/root/testdata/sf0.001}" 2>&1 \
  | grep "\[fault\]"
