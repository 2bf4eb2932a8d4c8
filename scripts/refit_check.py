#!/usr/bin/env python3
"""Independent re-fit of the frozen trained constants (ADVICE r10 #5 /
VERDICT r10 next-#7): the FrozenModels.scala literals are printed by the
SAME Scala kernels the queries run, so a fit bug would freeze itself in
and every "live" gate would agree with it. This script re-derives one
fit per family in pure Python — its own XXH64, its own Lloyd loop,
reading the raw parquet directly — and fails (exit 1) if the frozen
literals diverge.

Families covered here:
  - e10 semDedup cells  (semCellsSql: autoNlist x 64, lloyd iters=10)
  - e08 PQ codebooks    (pqBooksSql: 8 x 16 x 8, lloyd iters=15)
The TaskSim ledger (n05) is covered by the bit-exact-vs-reference
TaskSimSpec, and the MLP weights (n09/n10) by DuckDB's independent
forward pass reproducing the confusion matrix cell-for-cell.

Exactness: the Scala fits are sequential IEEE double arithmetic over a
deterministic sample order (xxhash64(vec_id) asc, vec_id asc). This
script replays the same arithmetic in the same order with Python floats
(also IEEE doubles), so agreement is bit-exact; the gate uses 1e-12 to
leave room for libm-free ops only (there are none — add/mul/div only).

Usage: python3 scripts/refit_check.py [sfDir] [frozenModels.scala]
"""
import json
import math
import re
import sys

M64 = 1 << 64
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & (M64 - 1)


def xxh64_long(v, seed=42):
    """XXH64 of the 8-byte little-endian encoding of a signed 64-bit
    value — Spark's xxhash64(col) for a LongType column (seed 42).
    Returns the SIGNED result (Spark orders by the signed long)."""
    h = (seed + P5 + 8) % M64
    k1 = (v % M64 * P2) % M64
    k1 = (rotl(k1, 31) * P1) % M64
    h ^= k1
    h = (rotl(h, 27) * P1 + P4) % M64
    h ^= h >> 33
    h = (h * P2) % M64
    h ^= h >> 29
    h = (h * P3) % M64
    h ^= h >> 32
    return h - M64 if h >= (1 << 63) else h


def lloyd(pts, k, iters):
    """Replays Similarity.lloyd exactly: init = first k DISTINCT points
    in sample order, stride fill if short; per iter: nearest center by
    strict <, sequential sums in sample order, mean update only for
    non-empty clusters."""
    n = len(pts)
    kk = min(k, n)
    init = []
    for p in pts:
        if len(init) >= kk:
            break
        if not any(c == p for c in init):
            init.append(list(p))
    f = 0
    while len(init) < kk:
        init.append(list(pts[(f * n) // kk]))
        f += 1
    centers = init
    dims = len(pts[0])
    for _ in range(iters):
        sums = [[0.0] * dims for _ in range(kk)]
        counts = [0] * kk
        for v in pts:
            best, bd = 0, float("inf")
            for c in range(kk):
                cc = centers[c]
                d = 0.0
                for i in range(dims):
                    x = v[i] - cc[i]
                    d += x * x
                if d < bd:
                    bd, best = d, c
            s = sums[best]
            for i in range(dims):
                s[i] += v[i]
            counts[best] += 1
        for c in range(kk):
            if counts[c] > 0:
                centers[c] = [sums[c][i] / counts[c] for i in range(dims)]
    return centers


def frozen_literal(src, name):
    m = re.search(r'val %s: String = """(.*?)"""' % name, src, re.S)
    if not m:
        sys.exit(f"[refit] cannot find {name} in FrozenModels.scala")
    return json.loads(m.group(1))


def max_abs_diff(a, b):
    if isinstance(a, (int, float)):
        return abs(a - b)
    if len(a) != len(b):
        return float("inf")
    return max(max_abs_diff(x, y) for x, y in zip(a, b))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    frozen_path = (sys.argv[2] if len(sys.argv) > 2
                   else "src/main/scala/graft/queries/FrozenModels.scala")
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = tbl.column("vec_id").to_pylist()
    embs = tbl.column("embedding").to_pylist()
    # float32 -> float64 is exact; Spark's cast(array<double>) does the same
    rows = sorted(
        ((xxh64_long(int(i)), int(i), [float(x) for x in e]) for i, e in zip(ids, embs)),
        key=lambda r: (r[0], r[1]))
    sample = [r[2] for r in rows]
    n = len(sample)

    src = open(frozen_path).read()
    failures = 0

    # e10 semDedup cells: autoNlist(n) cells, train = first 10000 in hash
    # order (the whole table at sf0.01), lloyd iters=10
    k = max(4, min(4096, math.floor(math.sqrt(n) + 0.5)))
    mine = lloyd([list(v) for v in sample[:10000]], k, iters=10)
    frozen = frozen_literal(src, "semCellsSql")
    d = max_abs_diff(mine, frozen)
    print(f"[refit] e10 semDedup cells: k={k}, max |refit - frozen| = {d:.3e}")
    if d > 1e-12:
        failures += 1

    # e08 PQ codebooks: 8 subspaces x 16 codes, train = first 2000 in
    # hash order, lloyd iters=15 per subspace
    books = frozen_literal(src, "pqBooksSql")
    m, kq = 8, 16
    dims = len(sample[0])
    sub = dims // m
    worst = 0.0
    for j in range(m):
        pts = [v[j * sub:(j + 1) * sub] for v in sample[:2000]]
        bj = lloyd(pts, kq, iters=15)
        worst = max(worst, max_abs_diff(bj, books[j]))
    print(f"[refit] e08 PQ codebooks: {m}x{kq}x{sub}, max |refit - frozen| = {worst:.3e}")
    if worst > 1e-12:
        failures += 1

    if failures:
        sys.exit(f"[refit] {failures} frozen fit(s) diverge from the independent re-fit")
    print("[refit] all frozen fits reproduced independently")


if __name__ == "__main__":
    main()
