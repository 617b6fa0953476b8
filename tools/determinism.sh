#!/bin/bash
# Double-run + cross-config determinism gate: run graft.Verify twice (32 and
# 4 threads) and assert every query's output is bit-identical.
set -e
cd /root/repo
SF=${SF:-/root/testdata/sf0.01}
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify $SF /tmp/det_a" > /dev/null 2>&1
SPARK_GRAFT_CPUS=4  sbt -batch "runMain graft.Verify $SF /tmp/det_b" > /dev/null 2>&1
python3 - << 'EOF'
import glob, os, sys
import pyarrow.parquet as pq
import pandas as pd, numpy as np
bad = 0
for q in sorted(os.listdir('/tmp/det_a')):
    if q == 'oracle_sql.json': continue
    a = pd.concat([pq.read_table(f).to_pandas() for f in sorted(glob.glob(f'/tmp/det_a/{q}/*.parquet'))], ignore_index=True)
    b = pd.concat([pq.read_table(f).to_pandas() for f in sorted(glob.glob(f'/tmp/det_b/{q}/*.parquet'))], ignore_index=True)
    if len(a) != len(b):
        print(f"DIFF {q}: rows {len(a)} vs {len(b)}"); bad += 1; continue
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype == object:
            tup = lambda v: tuple(v) if hasattr(v, '__len__') and not isinstance(v, str) else v
            av, bv = av.map(tup), bv.map(tup)
        eq = (av.values == bv.values) | (pd.isna(av).values & pd.isna(bv).values)
        if not np.asarray(eq).all():
            print(f"DIFF {q}.{c}: {int((~np.asarray(eq)).sum())}"); bad += 1
print("determinism (2 JVMs, 32 vs 4 threads):", "FAIL" if bad else "PASS")
sys.exit(1 if bad else 0)
EOF
