#!/bin/sh
# NO committed driver-gate snapshots remain (round 10): every catalog
# query's gate is a live DuckDB derivation. This script documents what
# still needs regenerating after an intentional semantics or testdata
# change, and verifies the result.
#
# FROZEN-CONSTANT live oracles (e05/e08/e10/n07 centroids/codebooks, n05
# candidate ledger points, n09/n10 MLP weights): regenerate the
# FrozenModels.scala literals with
#   sbt "runMain graft.queries.DebugFreeze /root/testdata/sf0.01"
# (plus the N05 candidates section) — the oracles recompute the data-plane
# work live against them, so only the fit constants need refreshing.
# Regeneration cross-checks (the frozen fits come from the same kernels the
# queries run, so check one fit per family against something independent
# before freezing): refit_check.py below RE-DERIVES the e10 cell centroids
# and the e08 PQ codebooks in pure Python (its own XXH64, its own Lloyd
# loop, raw parquet) and fails this script if the FrozenModels literals
# diverge — a fit bug can no longer freeze itself in. The other families:
# spark.ml fits (e05/n07) are an independent Lloyd vs the hand-rolled
# Similarity.lloydCenters, and each frozen fit must make its OWN live gate
# (assignment counts / pair structure recomputed by DuckDB) pass; TaskSim
# ledger points (n05) — bit-exact-vs-reference TaskSimSpec must be green;
# MLP weights (n09/n10) — DuckDB's independent forward pass must reproduce
# the confusion counts cell-for-cell (it did at freeze time, r10).
#
# LIVE with no frozen part (nothing to regen): m01-m04 (recursive-LCG
# replays), d03 (XXH64 simhash replay), t05/d08 (winnowing replay),
# t19 (unrolled BPE loop), e04 (quantized LSH replay), e06/e09/e12
# (mean-recall floors vs the full-probe exact side), n02/n16 (decision-fold
# recursive-CTE replay), n04/n12 (independent SQL solves), n06 (grid +
# climb replay), n03 (the list-scheduling fold replayed as a recursive
# CTE, knob grid from events — LIVE since r10), n01/n15 (the SORT
# tracker fold — Kalman predict/update, IoU association, lifecycle —
# replayed as a recursive CTE, LIVE since r10), m05/n23 (the composite
# V-ETL pipeline: LCG synthesis + detect stub + tracker fold + windowed
# quality, all recomputed end-to-end by SortReplayOracle.m05Sql, LIVE
# since r10).
#
# Kernel semantics stay independently spec-checked (SortTrackerSpec,
# ReplaySpec, TaskSimSpec, SimplexSpec, KnobPlannerSpec, DedupSpec,
# SimilaritySpec). The only committed CSV left under src/test/resources
# is golden_skyscraper_log.csv — a HAND-DERIVED ReplaySpec fixture, not a
# generated snapshot.
#
# After any regen, this re-fits the frozen constants independently and
# verifies the full catalog against the live gates:
set -e
cd "$(dirname "$0")/.."
python3 scripts/refit_check.py /root/testdata/sf0.01
OUT=/tmp/golden_regen
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $OUT"
python3 scripts/check.py /root/testdata/sf0.01 $OUT
