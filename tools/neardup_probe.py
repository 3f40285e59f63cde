#!/usr/bin/env python3
"""Independent cross-check for x14's embedding near-dup pairs
(round-13 VERDICT directive 4 — the Porter lesson generalized).

x14's DuckDB oracle replays the LSH bucket join with hyperplanes
RENDERED FROM the engine's own Similarity.hyperplanes, so the oracle
cannot catch a broken plane generator (degenerate/correlated planes
would pass it bit-for-bit, exactly as the pre-round-13 Porter bug
passed the engine-rendered stem map). This probe derives its verdicts
from the raw embeddings parquet only:

 1. EXACT COSINES — every engine pair's cosine is recomputed here in
    index-order float64 (the documented kernel order) straight from
    the parquet values and must match to <=1e-9 and clear the 0.35
    threshold; pair keys must be strictly ordered and unique.
 2. EXACT SET GIVEN BUCKETS — with the dumped bucket column, the pair
    set must equal { (a,b) : bucket a == bucket b, bucket size in
    [2,4096], cos >= 0.35 } exactly (catches join/cap/threshold bugs
    and any pairs/buckets inconsistency, e.g. the "skew" mutation).
 3. LSH STATISTICS, ENGINE-INDEPENDENT — ground truth is the full
    brute-force pair set at cos >= 0.35 (sf0.01 is only ~1k vectors).
    Each ground-truth pair's collision probability under HONEST
    sign-bit LSH is p = (1 - acos(cos)/pi)^4; the observed collision
    count must sit inside a band around E = sum(p). The band is
    checked on the DISCRIMINATING stratum (cos < 0.8, where a
    collapsed plane set inflates the per-pair rate >= 2x) as well as
    overall, and the bucket fan-out must be >= 8 of the 16 possible
    sign patterns (4 honest Gaussian planes over ~1k vectors occupy
    all 16 whp; duplicated planes collapse to 2 — the "degenerate"
    mutation).

usage: neardup_probe.py <dumpDir> <sfDir>
exit 0 if all checks pass, 1 otherwise.
"""
import math
import sys

import duckdb

# Band multipliers for the collision-count check. Collisions of
# different pairs are correlated (4 shared planes), so the variance is
# wider than binomial; the band is set from the algebra of the failure
# mode it must catch: duplicated planes multiply the per-pair rate by
# (1-acos(c)/pi)^-3 >= 2.0 on the cos<0.8 stratum, while honest-plane
# runs measured at sf0.01 sit within ~25% of E (recorded in
# records/probes_r14.json). 0.45/1.8 leaves both margins.
BAND_LO, BAND_HI = 0.45, 1.8
THRESHOLD = 0.35
MIN_FANOUT = 8


def cosine(a, b):
    d = na = nb = 0.0
    for x, y in zip(a, b):
        d += x * y
        na += x * x
        nb += y * y
    denom = math.sqrt(na) * math.sqrt(nb)
    return 0.0 if denom == 0.0 else d / denom


def main():
    dump_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    vecs = {
        int(i): [float(x) for x in v]
        for i, v in con.execute(
            "SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))"
            f" FROM read_parquet('{sf_dir}/embeddings.parquet')").fetchall()
    }
    pairs = {
        (int(a), int(b)): float(c)
        for a, b, c in con.execute(
            f"SELECT id_a, id_b, cos FROM read_parquet('{dump_dir}/pairs/*.parquet')"
        ).fetchall()
    }
    buckets = dict(con.execute(
        f"SELECT id, bucket FROM read_parquet('{dump_dir}/buckets/*.parquet')"
    ).fetchall())
    errors = []

    # 1. exact cosines + well-formed keys
    raw = con.execute(
        f"SELECT id_a, id_b FROM read_parquet('{dump_dir}/pairs/*.parquet')"
    ).fetchall()
    if len(raw) != len(pairs):
        errors.append(f"duplicate pair keys: {len(raw)} rows, {len(pairs)} distinct")
    for (a, b), c in pairs.items():
        if a >= b:
            errors.append(f"unordered pair ({a},{b})")
            continue
        mine = cosine(vecs[a], vecs[b])
        if abs(mine - c) > 1e-9:
            errors.append(f"cosine mismatch ({a},{b}): engine {c!r} probe {mine!r}")
        if c < THRESHOLD:
            errors.append(f"below-threshold pair ({a},{b}): {c}")

    # 2. exact set given the dumped buckets
    by_bucket = {}
    for i, bkt in buckets.items():
        by_bucket.setdefault(bkt, []).append(int(i))
    expected = set()
    for bkt, members in by_bucket.items():
        if not (2 <= len(members) <= 4096):
            continue
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a, b = members[i], members[j]
                if cosine(vecs[a], vecs[b]) >= THRESHOLD:
                    expected.add((a, b))
    if expected != set(pairs):
        missing = sorted(expected - set(pairs))[:10]
        extra = sorted(set(pairs) - expected)[:10]
        errors.append(
            f"pair set != bucket-join replay: {len(expected - set(pairs))} missing"
            f" (e.g. {missing}), {len(set(pairs) - expected)} extra (e.g. {extra})")

    # 3. engine-independent LSH statistics from brute-force ground truth
    ids = sorted(vecs)
    gt = {}
    for i in range(len(ids)):
        vi = vecs[ids[i]]
        for j in range(i + 1, len(ids)):
            c = cosine(vi, vecs[ids[j]])
            if c >= THRESHOLD:
                gt[(ids[i], ids[j])] = c
    fanout = len(by_bucket)
    if fanout < MIN_FANOUT:
        errors.append(f"bucket fan-out {fanout} < {MIN_FANOUT}:"
                      " plane set looks collapsed/correlated")
    not_gt = [k for k in pairs if k not in gt]
    if not_gt:
        errors.append(f"{len(not_gt)} engine pairs absent from ground truth")
    stats = {}
    for stratum, sel in (("all", lambda c: True),
                         ("cos<0.8", lambda c: c < 0.8)):
        exp = obs = 0.0
        n = 0
        for k, c in gt.items():
            if not sel(c):
                continue
            n += 1
            exp += (1.0 - math.acos(max(-1.0, min(1.0, c))) / math.pi) ** 4
            obs += 1.0 if k in pairs else 0.0
        stats[stratum] = (n, exp, obs)
        # tiny strata carry no signal: require enough expected mass
        # that a >=2x rate shift clears the band decisively
        if exp >= 10.0 and not (BAND_LO * exp <= obs <= BAND_HI * exp):
            errors.append(
                f"collision count off-band [{stratum}]: observed {obs:.0f},"
                f" expected {exp:.1f}, band [{BAND_LO * exp:.1f}, {BAND_HI * exp:.1f}]")

    print(f"vectors={len(vecs)} gt_pairs={len(gt)} engine_pairs={len(pairs)}"
          f" fanout={fanout}")
    for s, (n, e, o) in stats.items():
        print(f"  stratum {s}: n={n} expected={e:.1f} observed={o:.0f}"
              f" ratio={'inf' if e == 0 else f'{o / e:.2f}'}")
    if errors:
        print(f"FAIL: {len(errors)} finding(s)")
        for e in errors[:20]:
            print("  " + e)
        sys.exit(1)
    print("PASS")


if __name__ == "__main__":
    main()
