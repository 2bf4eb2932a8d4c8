#!/bin/sh
# Regenerate the committed driver-gate goldens (sf0.01 snapshots) after an
# intentional semantics or testdata change:
#   n01_sort_tracks / n02_skyscraper_replay -> src/test/resources CSVs
#   n03/n04/n05/n06 -> VALUES literals printed for manual paste into the
#   catalog oracle SQL (ControlQueries / OfflineQueries)
# Kernel semantics stay independently spec-checked (SortTrackerSpec,
# ReplaySpec, TaskSimSpec, SimplexSpec); these snapshots give the driver's
# DuckDB gate a hard hash to hold the full-pipeline output to.
set -e
cd "$(dirname "$0")/.."
OUT=/tmp/golden_regen
SPARK_GRAFT_ONLY=n01_sort_tracks,n02_skyscraper_replay,n03_task_sim,n04_lp_plan,n05_placement_pareto,n06_hill_climb \
  SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $OUT"
python3 - <<'EOF'
import pandas as pd
for n, f in [('n01_sort_tracks', 'golden_n01_sort_tracks.csv'),
             ('n02_skyscraper_replay', 'golden_n02_skyscraper_replay.csv')]:
    df = pd.read_parquet(f'/tmp/golden_regen/{n}')
    df.to_csv(f'src/test/resources/{f}', index=False)
    print(f'wrote src/test/resources/{f} ({len(df)} rows)')
for n in ['n03_task_sim', 'n04_lp_plan', 'n05_placement_pareto', 'n06_hill_climb']:
    df = pd.read_parquet(f'/tmp/golden_regen/{n}')
    print(f'-- {n}: paste into the catalog oracle --')
    for t in df.itertuples(index=False):
        print('(' + ', '.join(f"'{v}'" if isinstance(v, str) else repr(v) if isinstance(v, float) else str(v) for v in t) + '),')
EOF
