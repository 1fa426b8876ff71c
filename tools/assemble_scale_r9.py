#!/usr/bin/env python3
"""Assemble SCALE_MEASURED_r9.json: a FRESH 50-batch x 6-variant
CurateRehearsal (the reworked fused/parallel ingest + the sharded
sketch variant — re-attesting the spans-every10 compaction law the
20-batch r8 artifact showed inverted), a fresh ServePathBench matrix
(the maintained-index serving ladder incl. the new JL sidecar at
d'=8/16/32 and its rotation costs), a fresh FrankenResidualBench
separation measurement, and the r8 ScaleLaws matrix carried for the
families whose code did not change this round (the candidate/pair
columns are deterministic; ingest-path families are all re-measured
fresh above).

Usage: assemble_scale_r9.py <rehearsal_log> <servepath_log> \
        <franken_log> <out.json>
"""
import json, re, sys, collections

rehearsal_log, servepath_log, franken_log, out = sys.argv[1:5]

fams = collections.defaultdict(list)


def ingest(path):
    for line in open(path):
        m = re.search(r'\{"family".*\}', line)
        if not m:
            continue
        row = json.loads(m.group(0))
        name = row.pop("family")
        fams[name].append(row)


ingest(rehearsal_log)   # curate_ingest / curate_compact (fresh, 50x6)
ingest(servepath_log)   # serve_path / jl_rotate (fresh, maintained path)
ingest(franken_log)     # franken_residual (fresh)

r8 = json.load(open("/root/repo/SCALE_MEASURED_r8.json"))
carried = []
for name, rows in r8["families"].items():
    # fresh measurements win; carry everything else except the r7-era
    # serve_path (superseded by the maintained-path matrix above)
    if name in fams:
        continue
    carried.append(name)
    fams[name] = rows

artifact = {
    "run": "CurateRehearsal 50x6 (fresh: fused/parallel ingest + sharded "
           "sketch variant) + ServePathBench sf0.1 x4 (fresh: maintained-"
           "index serving ladder incl. JL sidecar + rotations) + "
           "FrankenResidualBench sf0.1 (fresh) + r8 ScaleLaws matrix "
           "carried for code-unchanged families: " + ", ".join(sorted(carried)),
    "round": 9,
    "host": "local[32]",
    "note": "",  # filled by the committer with the round-9 law summary
    "families": dict(fams),
}
json.dump(artifact, open(out, "w"), indent=1)
print(f"wrote {out}: {len(fams)} families, "
      f"{sum(len(v) for v in fams.values())} rows "
      f"({len(carried)} carried from r8)")
