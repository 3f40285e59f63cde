#!/usr/bin/env python3
"""Merge the 8 per-chunk sf10 Bench records (/tmp/bench_sf10_chunk_N
.json) into records/bench_sf10_full_r16.json. Each chunk is a complete
Bench invocation with its own sentinel series; the merged record keeps
per-chunk sentinel summaries so a reader can scope which chunks ran
under load. Chunks missing at merge time are listed in
`chunks_missing` — an honest partial is recordable (no silent caps).

usage: python3 tools/merge_sf10_chunks.py [nChunks]
"""
import glob, json, os, sys

n_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 8
os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

queries, failed, chunks, missing = {}, [], {}, []
for i in range(1, n_chunks + 1):
    p = f"/tmp/bench_sf10_chunk_{i}.json"
    if not os.path.exists(p):
        missing.append(i)
        continue
    d = json.load(open(p))
    queries.update(d["queries"])
    failed.extend(d.get("failed", []))
    chunks[str(i)] = {
        "n": len(d["queries"]),
        "subtotal": round(sum(v for v in d["queries"].values() if v >= 0), 1),
        "calib_median": d.get("calib_median"),
        "calib_flag": d.get("calib_flag"),
        "iter_median": d.get("iter_median"),
        "iter_flag": d.get("iter_flag"),
        "spin_pre": d.get("spin_pre"),
        "spin_post": d.get("spin_post"),
    }
out = {
    "metric": "total",
    "value": round(sum(v for v in queries.values() if v >= 0), 3),
    "unit": "sec",
    "what": ("round-16 sf10 full-suite bench (r15 VERDICT directive 4), run as "
             f"{n_chunks} alphabetical chunks each in its own JVM with its own "
             "sentinel series (per-chunk summaries below). sf = /tmp/sf10_derived "
             "(ScaleGen-derived, incl. the four TPC-H tables added in r15)."),
    "queries": queries,
    "failed": sorted(set(failed)),
    "chunks": chunks,
    "chunks_missing": missing,
    "sf": "/tmp/sf10_derived",
}
path = "records/bench_sf10_full_r16.json"
json.dump(out, open(path, "w"), indent=1)
print(f"wrote {path}: {len(queries)} queries, total {out['value']}s, "
      f"failed {out['failed']}, missing chunks {missing}")
