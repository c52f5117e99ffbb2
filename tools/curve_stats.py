#!/usr/bin/env python
"""Summarize a pinned-curve run: per-stage wall sums + headline JSON.

Reads BENCH/<dir>/curve_c<N>.{out,err} pairs produced by run_curve.sh.
The .err tail carries one RoundStats(...) repr per crawl round; the .out
carries bench.py's single JSON line. Emits the per-stage attribution table
(the 2-vs-8 scaling evidence in BENCH/BASELINE.md) without hand-copying.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

STAGES = ("t_submit", "t_dispatch", "t_fetch", "t_parse", "t_commit")


def parse_run(out_path: Path) -> dict | None:
    err_path = out_path.with_suffix(".err")
    line = out_path.read_text().strip()
    if not line:
        return None
    head = json.loads(line.splitlines()[-1])
    stages = {s: 0.0 for s in STAGES}
    rounds = 0
    for m in re.finditer(r"RoundStats\(([^)]*)\)", err_path.read_text()):
        kv = dict(
            p.split("=") for p in m.group(1).split(", ") if "=" in p
        )
        rounds += 1
        for s in STAGES:
            stages[s] += float(kv.get(s, 0.0))
    return {
        "cores": head.get("cpus"),
        "urls_per_sec": head["value"],
        "wall_s": head["crawl"]["wall_s"],
        "visits": head["crawl"]["visits"],
        "steal_pct": head.get("steal_pct"),
        "mode": head["crawl"].get("mode", "memory"),
        "rounds": rounds,
        **{s: round(v, 1) for s, v in stages.items()},
    }


def main() -> None:
    d = Path(sys.argv[1] if len(sys.argv) > 1 else "BENCH/r4")
    runs = []
    for out in sorted(d.glob("curve_c*.out")):
        r = parse_run(out)
        if r:
            r["name"] = out.stem
            runs.append(r)
    runs.sort(key=lambda r: (r["mode"], r["cores"]))
    cols = ("name", "cores", "mode", "wall_s", "urls_per_sec",
            "steal_pct", *STAGES)
    print(" | ".join(cols))
    for r in runs:
        print(" | ".join(str(r.get(c, "")) for c in cols))
    by = {(r["cores"], r["mode"]): r for r in runs}
    for (lo, hi) in ((1, 4), (2, 8)):
        a, b = by.get((lo, "memory")), by.get((hi, "memory"))
        if a and b:
            eff = b["urls_per_sec"] / a["urls_per_sec"] / (hi / lo)
            print(f"{lo}->{hi} efficiency: {eff:.3f}")
            for s in STAGES:
                if b[s]:
                    print(f"  {s}: {a[s]} -> {b[s]}  ratio {a[s]/b[s]:.1f}x")


if __name__ == "__main__":
    main()
