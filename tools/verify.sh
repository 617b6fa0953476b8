#!/bin/bash
# Local t2 loop: compile, run graft.Verify at sf0.01, diff against DuckDB.
set -e
cd /root/repo
SF=${SF:-/root/testdata/sf0.01}
OUT=${OUT:-/tmp/verify_r1}
sbt -batch compile 2>&1 | grep -E "error|warn.*deprecat" || true
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 | grep -E "\[verify\]" || true
python3 tools/check.py "$SF" "$OUT" "$@"
