#!/usr/bin/env python3
"""Empirical scaling probe: time the most expensive bench queries at
sf0.01 and sf0.1 (a 10x data step) and report each query's empirical
time exponent e = log10(t_big / t_small).  e ~ 1 is linear; anything
super-linear beyond its declared posture is a scale defect the
per-plan audits would otherwise have to catch by hand (this probe
would have caught q_closeness's n/200 landmark growth mechanically:
its state was O(n^2/200), e ~ 2).

Usage:
  python3 scripts/scaling_probe.py [TOP_N] [query ...]

With no query args, picks the TOP_N (default 20) slowest queries from
the in-tree bench_full.json.  Writes scaling_report.json in-tree and
prints a table.  Flags e > FLAG_EXP (default 1.30, override via
SCALE_FLAG_EXP) for queries whose big-SF time exceeds 1 s (below
that, fixed per-query overhead -- session setup amortization, janino
compiles, 1-row finals -- dominates and the exponent is meaningless).

Queries flagged `memoized` in the bench artifact are probed like any
other but marked in the report: their small-SF timing may be a cache
read, so their exponent is a lower bound on the producer's true cost.
"""
import json
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMALL = "/root/testdata/sf0.01"
BIG = "/root/testdata/sf0.1"
FLAG_EXP = float(os.environ.get("SCALE_FLAG_EXP", "1.30"))
MIN_BIG_SEC = 1.0


def run_bench(sf_dir, names, out_path):
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_BENCH_OUT"] = out_path
    cmd = ["sbt", "-batch", "runMain graft.Bench " + " ".join(names)]
    print(f"[probe] benching {len(names)} queries at {sf_dir} ...", flush=True)
    r = subprocess.run(cmd, cwd=REPO, env=env,
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    if r.returncode != 0:
        sys.stderr.write(r.stdout.decode(errors="replace")[-4000:])
        raise SystemExit(f"bench at {sf_dir} failed")
    with open(out_path) as f:
        return json.load(f)


def main():
    args = sys.argv[1:]
    top_n = 20
    names = []
    if args and args[0].isdigit():
        top_n = int(args[0])
        names = args[1:]
    else:
        names = args
    full_path = os.path.join(REPO, "bench_full.json")
    with open(full_path) as f:
        full = json.load(f)
    if not names:
        ranked = sorted(full["queries"].items(),
                        key=lambda kv: -kv[1]["min"])
        names = [k for k, _ in ranked[:top_n]]
    memo = {k: bool(v.get("memoized")) for k, v in full["queries"].items()}

    small = run_bench(SMALL, names, "/tmp/scale_small.json")
    big = run_bench(BIG, names, "/tmp/scale_big.json")

    rows = []
    for q in sorted(names):
        ts = small["queries"].get(q, {}).get("min", -1.0)
        tb = big["queries"].get(q, {}).get("min", -1.0)
        if ts <= 0 or tb <= 0:
            rows.append({"query": q, "t_sf001": ts, "t_sf01": tb,
                         "exponent": None, "flag": "FAILED"})
            continue
        e = math.log10(tb / ts)
        flag = ("SUPER_LINEAR" if (e > FLAG_EXP and tb >= MIN_BIG_SEC)
                else "small" if tb < MIN_BIG_SEC else "ok")
        rows.append({"query": q, "t_sf001": round(ts, 3),
                     "t_sf01": round(tb, 3), "exponent": round(e, 3),
                     "flag": flag, "memoized": memo.get(q, False)})

    report = {"small_sf": SMALL, "big_sf": BIG, "flag_exponent": FLAG_EXP,
              "min_big_sec": MIN_BIG_SEC, "rows": rows}
    out = os.path.join(REPO, "scaling_report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"\n{'query':28s} {'t@0.01':>8s} {'t@0.1':>8s} {'exp':>6s}  flag")
    for r in rows:
        e = "n/a" if r["exponent"] is None else f"{r['exponent']:.3f}"
        m = " (memoized)" if r.get("memoized") else ""
        print(f"{r['query']:28s} {r['t_sf001']:8.3f} {r['t_sf01']:8.3f} "
              f"{e:>6s}  {r['flag']}{m}")
    n_bad = sum(1 for r in rows if r["flag"] == "SUPER_LINEAR")
    print(f"\n[probe] {len(rows)} probed, {n_bad} super-linear "
          f"(exponent > {FLAG_EXP} and t@0.1 >= {MIN_BIG_SEC}s); "
          f"report: {out}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
