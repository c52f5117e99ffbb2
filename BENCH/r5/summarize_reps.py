#!/usr/bin/env python
"""Summarize the round-5 repetition pairs (BENCH/r5/rep*_c*.out).

Prints per-iteration rows (value + probes), per-level best-of-N, the
per-iteration efficiencies, and the best-of-N 2->8 efficiency — the
numbers BENCH/BASELINE.md's round-5 scaling section reports."""
import glob
import json
import re

rows = {}
for f in sorted(glob.glob("BENCH/r5/rep*_c*.out")):
    m = re.search(r"rep(\d+)_c(\d+)\.out$", f)
    if not m:
        continue
    it, c = int(m.group(1)), int(m.group(2))
    try:
        j = json.loads(open(f).read().strip().splitlines()[-1])
    except (ValueError, IndexError):
        continue
    w = j["crawl"]["wake_rt_per_sec"]
    rows[(it, c)] = (j["value"], w["before"], w["after"], j["crawl"]["wall_s"])

its = sorted({it for it, _ in rows})
print(f"{'it':>3} {'c2 urls/s':>10} {'c2 probes':>15} {'c8 urls/s':>10} "
      f"{'c8 probes':>15} {'eff (c8/c2)/4':>14}")
effs = []
for it in its:
    a, b = rows.get((it, 2)), rows.get((it, 8))
    ea = f"{a[0]:>10} {a[1]:>7}/{a[2]:<7}" if a else f"{'-':>10} {'-':>15}"
    eb = f"{b[0]:>10} {b[1]:>7}/{b[2]:<7}" if b else f"{'-':>10} {'-':>15}"
    eff = (b[0] / a[0]) / 4 if a and b else None
    if eff:
        effs.append(eff)
    print(f"{it:>3} {ea} {eb} {('%.3f' % eff) if eff else '-':>14}")

best2 = max((v for (it, c), (v, *_r) in rows.items() if c == 2), default=None)
best8 = max((v for (it, c), (v, *_r) in rows.items() if c == 8), default=None)
print()
if best2 and best8:
    print(f"best-of-N: c2={best2} c8={best8} -> eff={(best8/best2)/4:.3f}")
if effs:
    effs.sort()
    print(f"per-iteration eff: min={effs[0]:.3f} "
          f"median={effs[len(effs)//2]:.3f} max={effs[-1]:.3f}")
healthy = {k: v for k, v in rows.items() if v[1] >= 30000 and v[2] >= 20000}
print("healthy-band runs (before>=30k, after>=20k):",
      {f"it{it}c{c}": v[0] for (it, c), v in sorted(healthy.items())})
