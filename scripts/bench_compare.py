#!/usr/bin/env python3
"""Render one or two Bench artifacts into the storm-adjudicated
comparison the round verdicts derive by hand (r16 verdict #7): per
artifact, the storm-excluded steady medians and best walls; across two
artifacts, the per-query deltas ranked by |delta|, with each side's
storm/regime context attached so a sitting-class delta is visible as
such instead of reading as a regression.

Usage:
  python3 scripts/bench_compare.py BENCH_r17.json [BENCH_r16.json]

Accepts both artifact generations:
  - r17+: pass_probe carries per-query regime + cold probes; the
    headline medians are storm-excluded by construction.
  - pre-r17 (r16): pass_probe has exec/mb/storm/best but the medians
    include flagged passes — this script RE-DERIVES the storm-excluded
    median from the steady_pass_N lines + the storm flags, so an r16
    artifact is compared on r17 semantics.
  - pre-r16 (no pass_probe): falls back to the published medians and
    says so.
"""
import json
import sys


def load(path):
    text = open(path).read()
    try:
        one = json.loads(text)
        if isinstance(one, dict) and "parsed" in one:
            # driver wrapper (BENCH_rN.json): only the summary survived
            # the stdout tail — expose it as a one-line artifact
            return {"total": [one["parsed"]], "_summary_only": True}
    except json.JSONDecodeError:
        pass
    lines = [json.loads(l) for l in text.splitlines() if l.strip()]
    by_metric = {}
    for l in lines:
        by_metric.setdefault(l.get("metric"), []).append(l)
    return by_metric


def adjudicated(by_metric):
    """name -> {median, regime, best, storms, cold_storm} on r17
    semantics, re-deriving storm-excluded medians when the artifact
    predates them."""
    total_line = by_metric["total"][-1]  # summary is printed last
    if by_metric.get("_summary_only"):
        print("   (driver-wrapper artifact: summary only — per-query "
              "adjudication needs the full JSONL, e.g. target/bench_latest.json)")
        return ({n: {"median": m, "regime": "unprobed", "best": None,
                     "storms": 0, "cold_storm": None}
                 for n, m in total_line.get("queries", {}).items()}, total_line)
    # the full per-query median map is the WIDEST "total" line (the
    # summary repeats the metric with only the slowest-10)
    medians = max((l["queries"] for l in by_metric["total"] if "queries" in l),
                  key=len, default=None)
    probe = (by_metric.get("pass_probe") or [{}])[0].get("queries", {})
    passes = []
    i = 1
    while f"steady_pass_{i}" in by_metric:
        passes.append(by_metric[f"steady_pass_{i}"][0]["queries"])
        i += 1
    out = {}
    for name, med in (medians or {}).items():
        q = probe.get(name, {})
        storms = q.get("storm", [])
        regime = q.get("regime")
        if regime is None and storms and passes:
            # pre-r17 artifact: re-derive the storm-excluded median.
            # NOTE pass_probe's per-pass arrays are wall-sorted like the
            # steady_pass_N lines, so flags align by index.
            walls = sorted(p[name] for p in passes if name in p)
            quiet = [w for w, s in zip(walls, storms) if not s]
            if not quiet:
                regime = "all_storm"
            elif len(quiet) == len(walls):
                regime = "quiet"
            else:
                regime = "storm_excluded(rederived)"
                med = sorted(quiet)[len(quiet) // 2]
        out[name] = {
            "median": med,
            "regime": regime or "unprobed",
            "best": q.get("best"),
            "storms": sum(bool(s) for s in storms),
            "cold_storm": q.get("cold_storm"),
        }
    return out, total_line


def fmt(v):
    return "-" if v is None else f"{v:.2f}"


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    cur, cur_total = adjudicated(load(sys.argv[1]))
    adj_total = sum(q["median"] for q in cur.values())
    best_total = sum(q["best"] for q in cur.values() if q["best"] is not None)
    storms = sum(q["storms"] for q in cur.values())
    print(f"== {sys.argv[1]}: {len(cur)} queries")
    print(f"   storm-excluded total {adj_total:.1f}s | best_total {best_total:.1f}s"
          f" | storm passes {storms}"
          f" | published value {cur_total.get('value')}")
    sitting = cur_total.get("sitting", {})
    if sitting:
        print(f"   sitting: load {sitting.get('load_start')}->{sitting.get('load_end')}"
              f" warmup {sitting.get('warmup_sweep_sec')}s"
              f" jit {sitting.get('jit_total_sec')}s gc {sitting.get('gc_total_sec')}s")
    if len(sys.argv) < 3:
        worst = sorted(cur.items(), key=lambda kv: -(kv[1]["median"] or 0))[:10]
        print("   slowest (median/best/regime):")
        for n, q in worst:
            print(f"     {n:34s} {fmt(q['median'])}/{fmt(q['best'])} {q['regime']}")
        return
    prev, _ = adjudicated(load(sys.argv[2]))
    prev_total = sum(q["median"] for q in prev.values())
    print(f"== vs {sys.argv[2]}: storm-excluded total {prev_total:.1f}s"
          f" -> {adj_total:.1f}s ({adj_total / prev_total - 1:+.1%})")
    rows = []
    for n in sorted(set(cur) & set(prev)):
        c, p = cur[n], prev[n]
        rows.append((abs(c["median"] - p["median"]), n, p, c))
    print("   largest |deltas| (prev->cur median, best, regimes):")
    for _, n, p, c in sorted(rows, reverse=True)[:15]:
        print(f"     {n:34s} {fmt(p['median'])}->{fmt(c['median'])}"
              f" best {fmt(p['best'])}->{fmt(c['best'])}"
              f" [{p['regime']}|{c['regime']}]")
    only_cur = set(cur) - set(prev)
    if only_cur:
        print(f"   new queries: {sorted(only_cur)}")


if __name__ == "__main__":
    main()
