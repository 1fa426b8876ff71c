#!/usr/bin/env python3
"""Assemble SCALE_MEASURED_r11.json: the FRESH round-11 families —
slot_sweep (the late-interaction slot stage-1 operating-point grid
behind q210's pinned knobs), maxsim_serve re-measured with the slot
variants next to the r10 pooled ladder, and lex_prune (the
postings-fetch pruning footprint, sorted-vs-hashed layout) — plus the
r10 matrix carried for every family whose code did not change this
round.

Usage: assemble_scale_r11.py <slotsweep_log> <maxsim_log> <lexprune_log> <out.json>
"""
import json, re, sys, collections

slotsweep_log, maxsim_log, lexprune_log, out = sys.argv[1:5]

fams = collections.defaultdict(list)


def ingest(path):
    for line in open(path):
        m = re.search(r'\{"family".*\}', line)
        if not m:
            continue
        row = json.loads(m.group(0))
        name = row.pop("family")
        fams[name].append(row)


ingest(slotsweep_log)  # slot_sweep (fresh grid)
ingest(maxsim_log)     # maxsim_serve + maxsim_cost (fresh, slot variants)
ingest(lexprune_log)   # lex_prune (fresh)

r10 = json.load(open("/root/repo/SCALE_MEASURED_r10.json"))
carried = []
for name, rows in r10["families"].items():
    if name in fams:
        continue
    carried.append(name)
    fams[name] = rows

artifact = {
    "run": "SlotSweep sf0.1 raw & x4 (slotK x rounds x slotNProbe x C "
           "grid behind q210's pinned knobs) + MaxSimBench re-run with "
           "slot variants + LexPruneBench (postings layout footprint) "
           "+ r10 matrix carried for code-unchanged families: "
           + ", ".join(sorted(carried)),
    "round": 11,
    "host": "local[32]",
    "note": "",  # filled by the committer with the round-11 law summary
    "families": dict(fams),
}
json.dump(artifact, open(out, "w"), indent=1)
print(f"wrote {out}: {len(fams)} families, "
      f"{sum(len(v) for v in fams.values())} rows "
      f"({len(carried)} carried from r10)")
