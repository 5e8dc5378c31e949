#!/usr/bin/env python3
"""Render the scale-sweep growth table from a tools/scale_sweep.sh output dir.

  python3 tools/sweep_table.py /tmp/scale_sweep_r10

Reads every <tag>.json (the 2-line Bench output captured by the sweep), takes
the final {"metric":"total"} line's per-query seconds, and prints a markdown
table of wall-clock per query per scale with per-decade growth ratios.
A timed-out leg (scale_sweep.sh writes {"dnf_timeout_s": N} on rc=124)
renders as DNF(>Ns) so a by-design blowup is a recorded data point with its
budget, not a hole; a missing/empty json renders as a bare DNF.
"""
import json
import re
import sys
from pathlib import Path

SCALES = ["1x", "10x", "100x"]


def leg(path: Path):
    """Per-query seconds dict, a DNF budget marker {"__dnf_s__": N}, or
    None (missing/unparseable leg)."""
    if not path.exists() or path.stat().st_size == 0:
        return None
    txt = path.read_text()
    m = None
    for m in re.finditer(r'\{"metric":"total".*', txt):
        pass
    if m is None:
        try:
            to = json.loads(txt)["dnf_timeout_s"]
            return {"__dnf_s__": to}
        except (json.JSONDecodeError, KeyError, TypeError):
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
        dnf_budget = {
            s: (per_scale[s] or {}).get("__dnf_s__") for s in SCALES
        }
        qnames = []
        for s in SCALES:
            for q in per_scale[s] or {}:
                if q not in qnames and q != "__dnf_s__":
                    qnames.append(q)
        for q in qnames:
            vals = [
                (per_scale[s] or {}).get(q) if per_scale[s] is not None else None
                for s in SCALES
            ]
            rows.append((fam, q, vals, [dnf_budget[s] for s in SCALES]))
    print("| family | query | 1x (s) | 10x (s) | 100x (s) | 10x/1x | 100x/10x |")
    print("|---|---|---|---|---|---|---|")
    for fam, q, (v1, v10, v100), budgets in rows:
        def f(v, i):
            if v is not None:
                return f"{v:.1f}"
            return f"DNF(>{budgets[i]}s)" if budgets[i] else "DNF"

        def r(a, b):
            return "—" if a is None or b is None or a <= 0 else f"{b / a:.1f}x"

        print(
            f"| {fam} | {q} | {f(v1, 0)} | {f(v10, 1)} | {f(v100, 2)} "
            f"| {r(v1, v10)} | {r(v10, v100)} |"
        )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sweep_r10")
