#!/usr/bin/env python3
"""Summarize the run_ab.sh HEAD-vs-269256f A/B into records/ab_r16.json.

Per query x build: all rep times (each already a median-of-3 inside its
own fresh JVM), the cross-rep median, and each JVM's own calib/spin
sentinel medians so a reader can discard contaminated reps. The
headline per query is ratio = head_median / old_median, plus each
build's ratio to the r13a committed record for the
environment-vs-code adjudication.

usage: python3 tools/summarize_ab.py [abDir] [> records/ab_r16.json]
"""
import glob, json, os, re, statistics, sys

ab_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ab_r16"
os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

r13a = {}
p = "records/bench_sf01_full_r13a.json"
if os.path.exists(p):
    r13a = json.load(open(p)).get("queries", {})

runs = {}  # (query, build) -> list of per-rep dicts
for f in sorted(glob.glob(os.path.join(ab_dir, "*_rep*.json"))):
    m = re.match(r"(.+)_(head|old)_rep(\d+)\.json", os.path.basename(f))
    if not m:
        continue
    q, build, rep = m.group(1), m.group(2), int(m.group(3))
    try:
        d = json.load(open(f))
    except Exception:
        continue
    t = list(d.get("queries", {}).values())
    entry = {
        "rep": rep,
        "t": t[0] if t else None,
        "calib_median": d.get("calib_median"),
        "calib_flag": d.get("calib_flag"),
        "spin_pre": d.get("spin_pre"),
        "spin_post": d.get("spin_post"),
    }
    runs.setdefault((q, build), []).append(entry)

queries = sorted({q for (q, _) in runs})
out = {"ab": "HEAD vs 269256f (r13)", "dir": ab_dir, "queries": {}}
for q in queries:
    row = {"r13a_record": r13a.get(q)}
    for build in ("head", "old"):
        reps = sorted(runs.get((q, build), []), key=lambda e: e["rep"])
        ts = [e["t"] for e in reps if e["t"] is not None and e["t"] >= 0]
        row[build] = {
            "reps": reps,
            "median": statistics.median(ts) if ts else None,
            "min": min(ts) if ts else None,
        }
    hm, om = row["head"]["median"], row["old"]["median"]
    if hm and om:
        row["head_over_old"] = round(hm / om, 3)
    rec = row["r13a_record"]
    if rec:
        if hm:
            row["head_over_r13a"] = round(hm / rec, 3)
        if om:
            row["old_over_r13a"] = round(om / rec, 3)
    out["queries"][q] = row

# adjudication headline: if old ~= head everywhere, the r13->r15 step-up
# is NOT code; if old reproduces r13a where head doesn't, it IS code.
ratios = [r["head_over_old"] for r in out["queries"].values()
          if r.get("head_over_old")]
if ratios:
    out["head_over_old_median"] = round(statistics.median(ratios), 3)
old_vs_rec = [r["old_over_r13a"] for r in out["queries"].values()
              if r.get("old_over_r13a")]
if old_vs_rec:
    out["old_over_r13a_median"] = round(statistics.median(old_vs_rec), 3)

json.dump(out, sys.stdout, indent=1)
print()
