#!/bin/sh
# Regenerate the committed driver-gate goldens (sf0.01 snapshots) after an
# intentional semantics or testdata change:
#   n01/n02 (control replay), d03/e04/e06 (hash/ANN tables)
#     -> src/test/resources CSVs
#   n03/n04/n05/n06/n12 (simulator/planner), e05/n07/n09/n10 (seeded ML)
#     -> VALUES literals printed for manual paste into the catalog oracles
# (m01-m04 are LIVE since round 7: recursive-LCG DuckDB oracles)
# Kernel semantics stay independently spec-checked (SortTrackerSpec,
# ReplaySpec, TaskSimSpec, SimplexSpec, KnobPlannerSpec, DedupSpec,
# SimilaritySpec); these snapshots give the driver's DuckDB gate a hard
# hash to hold the full-pipeline output to. All snapshot queries were
# stability-checked across 4/8/16-core runs before freezing.
set -e
cd "$(dirname "$0")/.."
OUT=/tmp/golden_regen
SPARK_GRAFT_ONLY=t19_bpe_merges,e08_pq_encode,e10_semdedup,e09_ivfpq_knn,e12_ivf_append,n01_sort_tracks,n02_skyscraper_replay,n16_stream_switch,n03_task_sim,n04_lp_plan,n05_placement_pareto,n06_hill_climb,n12_knapsack_plan,d03_simhash_candidates,e04_lsh_knn,e05_kmeans,e06_ivf_knn,n07_categories,n09_forecast_mlp,n10_forecast_mae,t05_winnow_fingerprints,d08_winnow_candidates,m05_vetl_pipeline \
  SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $OUT"
python3 - <<'EOF'
import pandas as pd
for n, f in [('n01_sort_tracks', 'golden_n01_sort_tracks.csv'),
             ('n02_skyscraper_replay', 'golden_n02_skyscraper_replay.csv'),
             ('d03_simhash_candidates', 'golden_d03_simhash.csv'),
             ('e04_lsh_knn', 'golden_e04_lsh_knn.csv'),
             ('e06_ivf_knn', 'golden_e06_ivf_knn.csv'),
             ('n16_stream_switch', 'golden_n16_stream_switch.csv'),
             ('e08_pq_encode', 'golden_e08_pq.csv'),
             ('e09_ivfpq_knn', 'golden_e09_ivfpq_knn.csv'),
             ('e12_ivf_append', 'golden_e12_ivf_append.csv'),
             ('e10_semdedup', 'golden_e10_semdedup.csv'),
             # m05's BATCH output is ALSO n23_vetl_stream's oracle — the
             # streaming twin is checked against the batch composition
             ('m05_vetl_pipeline', 'golden_m05_vetl_quality.csv')]:
    df = pd.read_parquet(f'/tmp/golden_regen/{n}')
    df.to_csv(f'src/test/resources/{f}', index=False)
    print(f'wrote src/test/resources/{f} ({len(df)} rows)')
for n in ['n03_task_sim', 'n04_lp_plan', 'n05_placement_pareto', 'n06_hill_climb',
          'n12_knapsack_plan', 'e05_kmeans', 'n07_categories', 'n09_forecast_mlp',
          'n10_forecast_mae', 't05_winnow_fingerprints', 'd08_winnow_candidates']:
    df = pd.read_parquet(f'/tmp/golden_regen/{n}')
    print(f'-- {n}: paste into the catalog oracle --')
    for t in df.itertuples(index=False):
        # float(v): numpy 2.x repr is 'np.float64(..)'; escape ' in strings
        print('(' + ', '.join(
            "'" + v.replace("'", "''") + "'" if isinstance(v, str)
            else repr(float(v)) if isinstance(v, float)
            else str(v) for v in t) + '),')
EOF
