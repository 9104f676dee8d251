#!/usr/bin/env python3
"""Per-query scaling-slope table over two or three scale points.

Usage:
  python3 tools/scaling_report.py <bench_sf0.01.json> <bench_sf0.1.json>
  python3 tools/scaling_report.py <bench_sf0.001.json> <bench_sf0.01.json> <bench_sf0.1.json>

Emits a markdown table of per-query times, the per-decade time ratios,
and (3-point mode) a curvature column = ratio2/ratio1: how much the
slope GREW from the first decade to the second. A ratio well above the
data ratio (10x) flags superlinear work; curvature well above 1 on a
query whose second-decade ratio is already substantial flags hidden
acceleration that a single ratio hides (a query can look 8x on one
decade and be quietly quadratic). Ratios near 1 mean fixed overhead
dominates at these scales (fine — and why small-end curvature alone is
NOT flagged: the first decade of a tiny query measures JVM constants,
not data-dependent work). The known quadratic-by-contract queries are
annotated rather than flagged.
"""
import json
import sys

# documented superlinear-by-contract operators (per-cluster O(n^2/k),
# per-pair verification on a planted-density corpus, etc.)
QUADRATIC_BY_CONTRACT = {
    "q5a_semantic_dedup": "SemDeDup per-cluster O(n^2/k) by design",
    "q7a_item_item_cf": "item-item co-occurrence: sum of capped-basket squares",
    "q7b_cf_hitrate": "rides q7a's pair table",
    "q7c_cf_coverage": "rides q7a's pair table",
    "q7d_ranking_eval": "rides q7a's pair table",
    "qcl_grid_dbscan": "fixed-eps neighborhood graph densifies with corpus density by definition",
}
# threshold: at a 10x data step, a query doing linear work with a real
# data-dependent term should land well under this; 15 leaves headroom
# for shuffle-constant amortization differences between the two scales
FLAG_RATIO = 15.0
# curvature gate: flag only when the slope more than doubled decade-over-
# decade AND the final-decade ratio is already substantial (>=5x) AND the
# large-scale time is big enough (>=1s) that the ratio measures data-
# dependent work rather than constant-overhead noise.
FLAG_CURVE = 2.0
FLAG_CURVE_MIN_R2 = 5.0
FLAG_CURVE_MIN_BIG_S = 1.0
# r1 only measures data-dependent slope when the MIDPOINT time is above
# the per-query JVM/planning floor; below it, t(small)~=t(mid)~=overhead
# makes r1~=1 and curvature~=r2 — overhead floor, not acceleration.
FLAG_CURVE_MIN_MID_S = 0.5
# queries whose slope GROWTH is documented and linear-by-analysis: both
# decade ratios stay below the 10x data ratio, but a large linear
# constant (e.g. a 7-way countDistinct EXPAND = 7 passes) keeps the
# small scales overhead-bound, so the slope "grows" into its true
# linear rate rather than accelerating past it.
LINEAR_LARGE_CONSTANT = {
    "q1d_data_profile": "7-way exact countDistinct EXPAND (documented "
        "exact-by-contract; q1l is the approx 100 TB swap) — r1 and r2 "
        "both sub-linear, curvature is the overhead floor fading",
}


def load(path):
    d = json.load(open(path))
    return (d["sf"].split("/")[-1],
            {k: v["min"] for k, v in d["queries"].items() if v["min"] >= 0})


def main(paths):
    pts = [load(p) for p in paths]
    names = [sf for sf, _ in pts]
    common = sorted(set.intersection(*[set(q) for _, q in pts]))
    rows = []
    for q in common:
        ts = [pt[q] for _, pt in pts]
        ratios = [ts[i + 1] / max(ts[i], 1e-3) for i in range(len(ts) - 1)]
        rows.append((ratios[-1], q, ts, ratios))
    rows.sort(reverse=True)
    flagged, curved = [], []
    hdr = " | ".join(f"{n} s" for n in names)
    if len(pts) == 3:
        print(f"| query | {hdr} | r1 | r2 | curvature | note |")
        print("|---|---|---|---|---|---|---|---|")
    else:
        print(f"| query | {hdr} | ratio | note |")
        print("|---|---|---|---|---|")
    for last_ratio, q, ts, ratios in rows:
        note = QUADRATIC_BY_CONTRACT.get(q, "")
        if last_ratio > FLAG_RATIO and q not in QUADRATIC_BY_CONTRACT:
            note = "**FLAG: superlinear?**"
            flagged.append(q)
        tcols = " | ".join(f"{t:.2f}" for t in ts)
        if len(pts) == 3:
            r1, r2 = ratios
            curve = r2 / max(r1, 1e-3)
            if (q not in QUADRATIC_BY_CONTRACT and curve >= FLAG_CURVE
                    and r2 >= FLAG_CURVE_MIN_R2
                    and ts[-1] >= FLAG_CURVE_MIN_BIG_S
                    and ts[1] >= FLAG_CURVE_MIN_MID_S):
                # the exemption's own precondition is CHECKED, not
                # assumed: if either decade ever turns superlinear, the
                # annotation no longer applies and the flag fires
                if q in LINEAR_LARGE_CONSTANT and r1 < 10.0 and r2 < 10.0:
                    note = (note + " " if note else "") + LINEAR_LARGE_CONSTANT[q]
                else:
                    note = (note + " " if note else "") + "**FLAG: accelerating**"
                    curved.append(q)
            print(f"| {q} | {tcols} | {r1:.1f}x | {r2:.1f}x "
                  f"| {curve:.2f} | {note} |")
        else:
            print(f"| {q} | {tcols} | {ratios[0]:.1f}x | {note} |")
    print()
    print(f"flagged: {len(flagged)} ({', '.join(flagged) if flagged else '-'})")
    if len(pts) == 3:
        print(f"accelerating: {len(curved)} "
              f"({', '.join(curved) if curved else '-'})")


if __name__ == "__main__":
    main(sys.argv[1:])
