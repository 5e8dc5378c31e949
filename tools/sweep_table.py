#!/usr/bin/env python3
"""Render the scale-sweep growth table from a tools/scale_sweep.sh output dir.

  python3 tools/sweep_table.py /tmp/scale_sweep_r10

Reads every <tag>.json (the 2-line Bench output captured by the sweep), takes
the final {"metric":"total"} line's per-query seconds, and prints a markdown
table of wall-clock per query per scale with per-decade growth ratios.
A missing/empty json (timeout leg) renders as DNF with the configured
timeout so a by-design blowup is a recorded data point, not a hole.
"""
import json
import re
import sys
from pathlib import Path

SCALES = ["1x", "10x", "100x"]


def leg(path: Path):
    if not path.exists() or path.stat().st_size == 0:
        return None
    txt = path.read_text()
    m = None
    for m in re.finditer(r'\{"metric":"total".*', txt):
        pass
    if m is None:
        return None
    try:
        return json.loads(m.group(0))["queries"]
    except (json.JSONDecodeError, KeyError):
        return None


def main(outdir: str) -> None:
    out = Path(outdir)
    fams = sorted({p.name.split("_")[0] for p in out.glob("b*_*.json")})
    rows = []
    for fam in fams:
        per_scale = {s: leg(out / f"{fam}_{s}.json") for s in SCALES}
        qnames = []
        for s in SCALES:
            for q in per_scale[s] or {}:
                if q not in qnames:
                    qnames.append(q)
        for q in qnames:
            vals = [
                (per_scale[s] or {}).get(q) if per_scale[s] is not None else None
                for s in SCALES
            ]
            rows.append((fam, q, vals))
    print("| family | query | 1x (s) | 10x (s) | 100x (s) | 10x/1x | 100x/10x |")
    print("|---|---|---|---|---|---|---|")
    for fam, q, (v1, v10, v100) in rows:
        def f(v):
            return "DNF" if v is None else f"{v:.1f}"

        def r(a, b):
            return "—" if a is None or b is None or a <= 0 else f"{b / a:.1f}x"

        print(
            f"| {fam} | {q} | {f(v1)} | {f(v10)} | {f(v100)} "
            f"| {r(v1, v10)} | {r(v10, v100)} |"
        )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sweep_r10")
