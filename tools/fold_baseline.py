#!/usr/bin/env python3
"""Fold idle bench runs into bench/idle_baseline.json (monotone per-query
MIN) and keep its calibration stamp (`cal_min`) consistent — the stamp is
the MIN calibration across the runs that ever contributed minima, i.e.
"box speed on the best capture day". Bench divides its own cal by this to
emit cal-normalized totals/ratios (r18 verdict #1), so a hand-fold that
forgets the stamp would silently break the gate; use this tool.

Usage: tools/fold_baseline.py bench/bench_r19_idle.json [more runs...]
"""
import json
import re
import sys

BASELINE = "bench/idle_baseline.json"


def parse_run(path):
    txt = open(path).read()
    # idle artifacts are the Bench total_detail line (whole-file JSON) or a
    # saved variant with the same fields; be permissive: regex the queries
    # dict entries and the cal_s vector
    queries = {}
    m = re.search(r'"queries"\s*:\s*\{([^}]*)\}', txt)
    if not m:
        sys.exit(f"{path}: no queries dict found")
    for k, v in re.findall(r'"(q\d+)"\s*:\s*(-?\d+(?:\.\d+)?)', m.group(1)):
        v = float(v)
        if v >= 0:  # -1 markers are errors, not timings
            queries[k] = v
    cal = re.search(r'"cal_s"\s*:\s*\[([^\]]*)\]', txt)
    cal_min = min(float(x) for x in cal.group(1).split(",")) if cal else None
    return queries, cal_min


def main():
    runs = sys.argv[1:]
    if not runs:
        sys.exit(__doc__)
    base = json.load(open(BASELINE))
    merged = dict(base["queries"])
    cal_min = base.get("cal_min")
    changed = []
    parsed = []
    for path in runs:
        queries, run_cal = parse_run(path)
        if run_cal is None:
            sys.exit(f"{path}: no cal_s vector — not an idle bench artifact")
        parsed.append((run_cal, queries))
    # fold fastest-day first (r20 review): the normalization scale below
    # uses the stamp AS OF each iteration, so an arbitrary argv order
    # would leave slow runs folded before a faster one loose relative to
    # the final stamp — ascending cal makes multi-run folds deterministic
    # and every entry tight against the resulting stamp
    for run_cal, queries in sorted(parsed, key=lambda p: p[0]):
        # r19 ADVICE #2: a minimum captured on a slow day would otherwise
        # enter (run_cal / cal_min)x LOOSE relative to the stamp, making
        # the normalized gate that much more forgiving for that query —
        # normalize this run's values to the stamp's box speed before the
        # monotone fold (the same division Bench's provisional-entry path
        # applies). When this run is itself the fastest day so far, the
        # stamp moves down to it (contributing runs only, below) and
        # PRE-EXISTING entries stay put: they are physical measurements
        # from slower days, accepted loose and converging as future runs
        # re-contribute — per-entry capture cals would fix that fully but
        # would break Bench's flat "qNN": number parse.
        scale = 1.0 if cal_min is None else min(cal_min, run_cal) / run_cal
        contributed = False
        for k, v in queries.items():
            v = round(v * scale, 3)
            if k not in merged or v < merged[k]:
                merged[k] = v
                changed.append(k)
                contributed = True
        # the stamp describes the days the MINIMA were captured: a run
        # that contributed no minimum must not move it, or a fast-but-
        # slow-queries day would inflate every future calFactor and bias
        # gate_ratio_norm low (r19 review)
        if contributed and (cal_min is None or run_cal < cal_min):
            cal_min = run_cal
    out = {
        "note": base["note"],
        "cal_min": round(cal_min, 3),
        "cal_min_note": (
            "calibration (Bench's fixed lineitem probe, min-of-5) on the "
            "fastest box-day that contributed minima; Bench normalizes its "
            "own cal against this for cal_norm_total / gate_ratio_norm"
        ),
        "queries": {k: merged[k] for k in sorted(merged)},
    }
    with open(BASELINE, "w") as fh:
        json.dump(out, fh, indent=0)
        fh.write("\n")
    print(f"folded {len(runs)} run(s): {len(set(changed))} minima updated, "
          f"{len(merged)} queries, cal_min={out['cal_min']}")


if __name__ == "__main__":
    main()
