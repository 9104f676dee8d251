#!/usr/bin/env python3
"""Merge a bench run's per-query mins into the committed quiet-floor file.

Usage: python3 tools/merge_quiet.py <bench_full.json> [quiet.json]

Elementwise MIN against the existing floors (a floor only ever ratchets
down on the same environment), adding queries the floor file has never
seen. Prints a summary of changes. Wholesale re-basing (after a VM or
fixture change) is deliberately manual: delete the old file first.
"""
import json
import sys


def main(full_path, quiet_path="tools/bench_quiet.json"):
    full = json.load(open(full_path))
    mins = {k: v["min"] for k, v in full["queries"].items() if v["min"] >= 0}
    try:
        quiet = json.load(open(quiet_path))
    except FileNotFoundError:
        quiet = {}
    added, lowered = [], []
    for q, t in sorted(mins.items()):
        if q not in quiet:
            quiet[q] = round(t, 3)
            added.append(q)
        elif t < quiet[q]:
            lowered.append((q, quiet[q], round(t, 3)))
            quiet[q] = round(t, 3)
    body = ",\n".join(f' "{q}": {t}' for q, t in sorted(quiet.items()))
    with open(quiet_path, "w") as f:
        f.write("{\n" + body + "\n}\n")
    print(f"added {len(added)}: {', '.join(added) if added else '-'}")
    print(f"lowered {len(lowered)}:")
    for q, old, new in lowered:
        print(f"  {q}: {old} -> {new}")


if __name__ == "__main__":
    main(*sys.argv[1:])
