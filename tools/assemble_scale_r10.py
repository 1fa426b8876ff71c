#!/usr/bin/env python3
"""Assemble SCALE_MEASURED_r10.json: a FRESH 50-batch x 7-variant
CurateRehearsal (the r9 matrix plus the lex-every10 variant measuring
the q175 postings-index upkeep per batch), the fresh ServeSweep
operating-point grid (nProbe x prefilterC x d' on the raw AND
x4-amplified sf0.1 corpus — the basis of the pinned
SemanticStream.ServePolicy), and the r9 matrix carried for the
families whose code did not change this round (the r9 serve_path
latency ladder stays — ServeSweep ranks recall, not latency).

Usage: assemble_scale_r10.py <rehearsal_log> <servesweep_log> <out.json>
"""
import json, re, sys, collections

rehearsal_log, servesweep_log, out = sys.argv[1:4]

fams = collections.defaultdict(list)


def ingest(path):
    for line in open(path):
        m = re.search(r'\{"family".*\}', line)
        if not m:
            continue
        row = json.loads(m.group(0))
        name = row.pop("family")
        fams[name].append(row)


ingest(rehearsal_log)   # curate_ingest / curate_compact (fresh, 50x7)
ingest(servesweep_log)  # serve_sweep (fresh, raw + amplified grids)

r9 = json.load(open("/root/repo/SCALE_MEASURED_r9.json"))
carried = []
for name, rows in r9["families"].items():
    if name in fams:
        continue
    carried.append(name)
    fams[name] = rows

artifact = {
    "run": "CurateRehearsal 50x7 (fresh: + lex-every10 postings-upkeep "
           "variant) + ServeSweep sf0.1 raw & x4 (fresh: nProbe x "
           "prefilterC x d' operating-point grid behind the pinned "
           "ServePolicy) + r9 matrix carried for code-unchanged "
           "families: " + ", ".join(sorted(carried)),
    "round": 10,
    "host": "local[32]",
    "note": "",  # filled by the committer with the round-10 law summary
    "families": dict(fams),
}
json.dump(artifact, open(out, "w"), indent=1)
print(f"wrote {out}: {len(fams)} families, "
      f"{sum(len(v) for v in fams.values())} rows "
      f"({len(carried)} carried from r9)")
