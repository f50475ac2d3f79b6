#!/usr/bin/env python3
"""Per-query bench-time growth between two scale points (dev tool,
stdlib only). Usage:

    python3 tools/time_growth.py BENCH_sf001.json BENCH_sf01.json \
        [TIME_GROWTH.json]

Each input is a graft.Bench JSON line (the file may contain exactly that
line). Emits per-query seconds at both points and the ratio, flagging
queries whose time grew faster than `SLACK` x the data-size ratio AND
whose large-point time is above `MIN_SEC` (sub-second queries are fixed
overhead dominated — their ratios are noise, not scale signal).

This is the TIME companion to SCALE_GROWTH.json's candidate-count
growth: counts prove the algorithmic bound, times prove the engine
actually delivers it.
"""
import json
import re
import sys

SLACK = 2.0
MIN_SEC = 0.5
FALLBACK_DATA_RATIO = 10.0  # sf0.01 -> sf0.1


def load(path):
    with open(path) as f:
        return json.loads(f.read().strip().splitlines()[-1])


def sf_of(bench):
    """Scale factor from the bench's sf dir (".../sf0.1" -> 0.1)."""
    m = re.search(r"sf([0-9.]+)/?$", str(bench.get("sf", "")))
    return float(m.group(1)) if m else None


def main():
    small, large = load(sys.argv[1]), load(sys.argv[2])
    out_path = sys.argv[3] if len(sys.argv) > 3 else "TIME_GROWTH.json"
    # Derive the data ratio from the inputs' sf fields (round-7 advice:
    # a hardcoded 10.0 silently mis-judges non-adjacent scale points,
    # e.g. sf0.001 vs sf0.1 is 100x).
    sf_s, sf_l = sf_of(small), sf_of(large)
    DATA_RATIO = (sf_l / sf_s) if sf_s and sf_l else FALLBACK_DATA_RATIO
    qs = sorted(set(small["queries"]) & set(large["queries"]))
    rows, flagged = {}, []
    for q in qs:
        s, l = small["queries"][q], large["queries"][q]
        ratio = l / s if s > 0 else -1.0
        super_linear = l >= MIN_SEC and ratio > SLACK * DATA_RATIO
        rows[q] = {"sec_small": round(s, 4), "sec_large": round(l, 4),
                   "ratio": round(ratio, 2), "super_linear": super_linear}
        if super_linear:
            flagged.append(q)
    doc = {
        "sf_small": small.get("sf"), "sf_large": large.get("sf"),
        "data_ratio": DATA_RATIO, "slack": SLACK, "min_sec": MIN_SEC,
        "total_small": small["value"], "total_large": large["value"],
        "total_ratio": round(large["value"] / small["value"], 2),
        "n_queries": len(qs), "flagged": flagged, "queries": rows,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"total {small['value']:.1f}s -> {large['value']:.1f}s "
          f"({doc['total_ratio']}x for {DATA_RATIO}x data); "
          f"{len(flagged)} flagged: {flagged}")


if __name__ == "__main__":
    main()
