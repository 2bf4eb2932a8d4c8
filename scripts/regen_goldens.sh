#!/bin/sh
# NO committed driver-gate snapshots remain (round 10): every catalog
# query's gate is a live DuckDB derivation. This script documents what
# still needs regenerating after an intentional semantics or testdata
# change, and verifies the result.
#
# FROZEN-CONSTANT live oracles (e05/n07 spark.ml centroids, n05
# candidate ledger points, n09/n10 MLP weights): regenerate the
# FrozenModels.scala literals with
#   sbt "runMain graft.queries.DebugFreeze /root/testdata/sf0.01"
# (plus the N05 candidates section) — the oracles recompute the data-plane
# work live against them, so only the fit constants need refreshing.
# (e08's PQ codebooks and e10's semDedup cell centers left FrozenModels
# in r14: their Lloyd fits are replayed LIVE inside the oracles as
# recursive CTEs — nothing to regenerate, SF-independent; the former
# refit_check.py pure-Python cross-check is superseded by the oracle
# itself being an independent in-SQL re-fit, validated stage-by-stage
# against a pure-Python replica before landing.)
# Regeneration cross-checks for the families that remain frozen:
# spark.ml fits (e05/n07) are an independent Lloyd vs the hand-rolled
# Similarity.lloydCenters, and each frozen fit must make its OWN live gate
# (assignment counts / pair structure recomputed by DuckDB) pass; TaskSim
# ledger points (n05) — bit-exact-vs-reference TaskSimSpec must be green;
# MLP weights (n09/n10) — DuckDB's independent forward pass must reproduce
# the confusion counts cell-for-cell (it did at freeze time, r10).
#
# LIVE with no frozen part (nothing to regen): m01-m04 (recursive-LCG
# replays), d03 (XXH64 simhash replay), t05/d08 (winnowing replay),
# t19 (unrolled BPE loop), e04 (quantized LSH replay), e06/e09/e12/e19
# (full-replay ranked-row IVF-family oracles since r14 — sample order,
# Lloyd fits, assignment, ADC and re-rank all recomputed in SQL),
# e08/e10 (live Lloyd-replay oracles since r14), n02/n16 (decision-fold
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
# After any regen, verify the full catalog against the live gates:
set -e
cd "$(dirname "$0")/.."
OUT=/tmp/golden_regen
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $OUT"
python3 scripts/check.py /root/testdata/sf0.01 $OUT
