#!/usr/bin/env python3
"""Per-query scaling-slope table: sf0.01 vs sf0.1 bench runs.

Usage: python3 tools/scaling_report.py <bench_small.json> <bench_big.json>

Emits a markdown table of per-query times and the time ratio across the
10x data-scale step, sorted by ratio descending. A ratio well above the
data ratio (10x) flags superlinear work; ratios near 1 mean the query is
dominated by fixed overhead at these scales (fine). The known
quadratic-by-contract queries are annotated rather than flagged.
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


def main(small_path, big_path):
    small = json.load(open(small_path))
    big = json.load(open(big_path))
    s = {k: v["min"] for k, v in small["queries"].items() if v["min"] >= 0}
    b = {k: v["min"] for k, v in big["queries"].items() if v["min"] >= 0}
    rows = []
    for q in sorted(set(s) & set(b)):
        ratio = b[q] / max(s[q], 1e-3)
        rows.append((ratio, q, s[q], b[q]))
    rows.sort(reverse=True)
    flagged = []
    print(f"| query | {small['sf'].split('/')[-1]} s | "
          f"{big['sf'].split('/')[-1]} s | ratio | note |")
    print("|---|---|---|---|---|")
    for ratio, q, st, bt in rows:
        note = QUADRATIC_BY_CONTRACT.get(q, "")
        if ratio > FLAG_RATIO and q not in QUADRATIC_BY_CONTRACT:
            note = "**FLAG: superlinear?**"
            flagged.append(q)
        print(f"| {q} | {st:.2f} | {bt:.2f} | {ratio:.1f}x | {note} |")
    print()
    print(f"flagged: {len(flagged)} ({', '.join(flagged) if flagged else '-'})")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
