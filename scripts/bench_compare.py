#!/usr/bin/env python3
"""Mechanical same-set bench comparison — the ratchet ledger generator.

The round-close rule (BASELINE.md): a new round's total over the SAME
passing query set must stay <= 1.3x the pinned total, and every
per-query regression > 1.5x needs a plan-audit note.  Round 12's
VERDICT found the mover note hand-maintained and incomplete (two of
four >1.5x movers missing), so this script computes the ledger
mechanically: run it at every close and paste its output into the
BASELINE.md row.

Usage:
  python3 scripts/bench_compare.py OLD_bench.json NEW_bench.json \
      [--mover-ratio 1.5] [--min-abs 0.05]

Prints: shared-set totals and ratio, every >mover-ratio regression and
every <1/mover-ratio improvement (with absolute deltas), queries added
and removed, and the memoized flags that make a per-query number a
cache-hit minimum.  Since round 14, Bench also times the shared
memoized producers as `producer:*` rows — movers are ATTRIBUTED:
producer rows are listed in their own section (a build-cost change),
and a consumer mover that was a memo-hit in both runs is tagged as
serve-side (its producer's build cost lives in the producer row, so
the regression is in the consumer's own plan or the memo read path).
Movers below --min-abs seconds absolute change are tagged
"noise-scale".  Exit 1 if the shared-set ratio breaks the 1.3x rule
(producer rows count toward the shared-set total like any other row —
a build-cost regression is a regression).
"""
import argparse
import json
import sys


def load(path):
    """Accepts both bench shapes: the in-tree pin (queries ->
    {passes, min, memoized}) and the Bench stdout line (queries ->
    plain min-seconds floats)."""
    with open(path) as f:
        d = json.load(f)
    raw = d.get("queries", {})
    q, memo = {}, set()
    for k, v in raw.items():
        if isinstance(v, dict):
            q[k] = v.get("min", -1.0)
            if v.get("memoized"):
                memo.add(k)
        else:
            q[k] = v
    return q, memo, d


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("old", help="pinned bench_full.json (previous round)")
    ap.add_argument("new", help="candidate bench_full.json (this round)")
    ap.add_argument("--mover-ratio", type=float, default=1.5)
    ap.add_argument("--min-abs", type=float, default=0.05)
    args = ap.parse_args()
    mover, min_abs = args.mover_ratio, args.min_abs
    old_q, old_m, _ = load(args.old)
    new_q, new_m, _ = load(args.new)
    shared = sorted(k for k in old_q if k in new_q
                    and old_q[k] >= 0 and new_q[k] >= 0)
    t_old = sum(old_q[k] for k in shared)
    t_new = sum(new_q[k] for k in shared)
    ratio = t_new / t_old if t_old else float("nan")
    print(f"shared set: {len(shared)} queries, {t_old:.1f}s -> {t_new:.1f}s = {ratio:.3f}x")
    movers_up, movers_down = [], []
    for k in shared:
        o, n = old_q[k], new_q[k]
        if o <= 0:
            continue
        r = n / o
        flags = "".join(m for m, s in (("[memo-old]", k in old_m), ("[memo-new]", k in new_m)) if s)
        if r > mover:
            movers_up.append((r, k, o, n, flags))
        elif r < 1.0 / mover:
            movers_down.append((r, k, o, n, flags))

    def attribution(k, flags):
        if k.startswith("producer:"):
            return " [BUILD-side: shared memo build cost]"
        if "[memo-old]" in flags and "[memo-new]" in flags:
            return " [serve-side: memo-hit both runs — not producer absorption]"
        if ("[memo-old]" in flags) != ("[memo-new]" in flags):
            return " [memo-order shift: hit in one run only — compare the producer:* row]"
        return ""

    def section(title, movers, reverse):
        if not movers:
            return
        print(f"\n{title}:")
        for r, k, o, n, fl in sorted(movers, reverse=reverse):
            tag = " (noise-scale)" if abs(n - o) < min_abs else ""
            sign = "+" if n >= o else ""
            print(f"  {k}: {o:.2f}s -> {n:.2f}s = {r:.2f}x ({sign}{n - o:.2f}s){fl}{tag}{attribution(k, fl)}")

    prod_up = [m for m in movers_up if m[1].startswith("producer:")]
    cons_up = [m for m in movers_up if not m[1].startswith("producer:")]
    section(f"producer-row regressions > {mover}x (build-cost movers)", prod_up, True)
    section(f"consumer regressions > {mover}x (EVERY one needs a plan-audit note in BASELINE.md)", cons_up, True)
    section(f"improvements < {1 / mover:.2f}x (design wins to record)", movers_down, False)
    # Producer-coverage check (r14 VERDICT #8): a `memoized: true`
    # consumer's min is a cache-hit read, so its build cost must be
    # timed SOMEWHERE — either a producer:* row exists in the same run,
    # or the build is a documented single-consumer memo (the annfilt
    # posture: its build serves exactly one query, so that query's
    # first-pass time already carries it and a producer row would be
    # redundant). Newly-memoized queries are named so the round close
    # decides consciously instead of silently inheriting a ghost.
    new_producers = sorted(k for k in new_q if k.startswith("producer:"))
    newly_memoized = sorted(k for k in new_m
                            if k not in old_m and not k.startswith("producer:"))
    if new_m and not new_producers:
        print("\nWARN: run has memoized consumers but NO producer:* rows — "
              "build cost is hiding in consumer minima (pre-r14 bench format?)")
    if newly_memoized:
        print(f"\nnewly-memoized consumers ({len(newly_memoized)}) — verify each "
              "has a producer:* row or a documented single-consumer memo:")
        for k in newly_memoized:
            print(f"  {k}")
    added = sorted(k for k in new_q if k not in old_q)
    removed = sorted(k for k in old_q if k not in new_q)
    if added:
        t_add = sum(new_q[k] for k in added)
        print(f"\nadded ({len(added)}, +{t_add:.1f}s): " + ", ".join(
            f"{k} {new_q[k]:.2f}s" for k in sorted(added, key=lambda k: -new_q[k])))
    if removed:
        print(f"\nremoved ({len(removed)}): " + ", ".join(removed))
    if ratio > 1.3:
        print(f"\nFAIL: shared-set ratio {ratio:.3f}x breaks the 1.3x rule")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
