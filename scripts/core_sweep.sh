#!/bin/sh
# Partitioning-invariance sweep: dump the FULL catalog at sf0.01 under a
# 4-core and a 16-core session and compare every query output row-for-row.
# Proves the per-query determinism claims in COVERAGE.md catalog-wide
# (sum reorderings, partition-dependent sampling, or unstable ties would
# show up as a diff).
set -e
cd "$(dirname "$0")/.."
# clean first: Verify never deletes output dirs, so a renamed/removed
# query's stale dump would otherwise inflate the comparison count
rm -rf /tmp/sweep4 /tmp/sweep16
SPARK_GRAFT_CPUS=4 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/sweep4"
SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/sweep16"
python3 - <<'EOF'
import glob, os
import pandas as pd
names = sorted(os.path.basename(p) for p in glob.glob('/tmp/sweep4/*') if os.path.isdir(p))
n_ok = 0
bad = []
for n in names:
    try:
        a = pd.read_parquet(f'/tmp/sweep4/{n}')
        b = pd.read_parquet(f'/tmp/sweep16/{n}')
        a = a.reindex(sorted(a.columns), axis=1)
        b = b.reindex(sorted(b.columns), axis=1)
        for df in (a, b):
            for c in df.columns:
                if df[c].dtype == object:
                    df[c] = df[c].astype(str)
        a = a.sort_values(by=list(a.columns), kind='mergesort').reset_index(drop=True)
        b = b.sort_values(by=list(b.columns), kind='mergesort').reset_index(drop=True)
        if a.equals(b):
            n_ok += 1
        else:
            bad.append(n)
    except Exception as e:
        bad.append(f'{n} ({e})')
print(f'{n_ok}/{len(names)} bit-identical between 4-core and 16-core sessions')
for n in bad:
    print(f'DIFF {n}')
EOF
