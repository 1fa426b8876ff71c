#!/usr/bin/env python3
"""Assemble SCALE_MEASURED_r14.json: the FRESH round-14 families —
phash_band re-measured at BOTH grid widths (8x9 / 4 bands radius-3 and
16x9 / 8 bands radius-7, the width lever the r13 verdict asked to be a
measured row), phash_online (the maintained media band index's
per-batch upkeep vs the one-shot recompute), slot_drift +
slot_drift_serve re-measured with the new capped arm next to
frozen/fixed/auto, and slot_forward re-run through the registered
write path (bucketed table + ver-tagged meta) — plus the r13 matrix
carried for every family whose code did not change this round.

Usage: assemble_scale_r14.py <phash_log> <phashonline_log> <slotdrift_log> <slotfwd_log> <out.json>
"""
import json, re, sys, collections

phash_log, phashonline_log, slotdrift_log, slotfwd_log, out = sys.argv[1:6]

fams = collections.defaultdict(list)


def ingest(path):
    for line in open(path):
        m = re.search(r'\{"family".*\}', line)
        if not m:
            continue
        row = json.loads(m.group(0))
        name = row.pop("family")
        fams[name].append(row)


ingest(phash_log)        # phash_band (fresh, both widths)
ingest(phashonline_log)  # phash_online (fresh)
ingest(slotdrift_log)    # slot_drift + slot_drift_serve (fresh, 4 arms)
ingest(slotfwd_log)      # slot_forward (fresh, registered write path)

# fail loudly if a fresh log produced no rows — otherwise the carry
# loop below would silently substitute r13's stale rows while the note
# claims freshness (r12 review)
for required in ("phash_band", "phash_online", "slot_drift",
                 "slot_drift_serve", "slot_forward"):
    assert fams.get(required), f"fresh family '{required}' has no rows — " \
        "did its bench run fail? refusing to carry stale data as fresh"

r13 = json.load(open("/root/repo/SCALE_MEASURED_r13.json"))
carried = []
for name, rows in r13["families"].items():
    if name in fams:
        continue
    carried.append(name)
    fams[name] = rows

doc = {
    "run": "round-14 measurement assembly",
    "round": 14,
    "host": r13.get("host", "local[32] 128GiB"),
    "note": "fresh: phash_band at both grid widths (16-bit band keys "
            "held; pigeonhole radius 3 -> 7), phash_online (per-batch "
            "maintained-index upkeep vs one-shot re-hash), slot_drift "
            "with the capped trigger arm (bounded fires under "
            "persistent drift, recall held), slot_forward through the "
            "registered ver-tagged write path. Carried from r13 "
            "unchanged: " + ", ".join(sorted(carried)),
    "families": {k: v for k, v in sorted(fams.items())},
}
json.dump(doc, open(out, "w"), indent=1)
print(f"wrote {out}: fresh={sorted(set(fams) - set(carried))} "
      f"carried={len(carried)}")
