#!/usr/bin/env python3
"""Assemble SCALE_MEASURED_r12.json: the FRESH round-12 families —
slot_policy (the JOINT (slotK x slotNProbe x centroid-cut) operating
surface on both the decorrelated and the slot-aligned geometries, the
grid SlotPolicy is pinned from), slot_drift (slot-cell imbalance under
the collapse-drift ingest stream, frozen vs slotRetrain arms), and
attr_bucketed (the q193 attribution joins against the doc_id-bucketed
projection: exchange counts plain vs bucketed) — plus the r11 matrix
carried for every family whose code did not change this round.

Usage: assemble_scale_r12.py <slotpolicy_log> <slotdrift_log> <attr_log> <out.json>
"""
import json, re, sys, collections

slotpolicy_log, slotdrift_log, attr_log, out = sys.argv[1:5]

fams = collections.defaultdict(list)


def ingest(path):
    for line in open(path):
        m = re.search(r'\{"family".*\}', line)
        if not m:
            continue
        row = json.loads(m.group(0))
        name = row.pop("family")
        fams[name].append(row)


ingest(slotpolicy_log)  # slot_policy (fresh joint grid, both geometries)
ingest(slotdrift_log)   # slot_drift (fresh)
ingest(attr_log)        # attr_bucketed (fresh)

# fail loudly if a fresh log produced no rows — otherwise the carry
# loop below would silently substitute r11's stale rows while the note
# claims freshness (r12 review)
for required in ("slot_policy", "slot_drift", "attr_bucketed"):
    assert fams.get(required), f"fresh family '{required}' has no rows — " \
        "did its bench run fail? refusing to carry stale data as fresh"

r11 = json.load(open("/root/repo/SCALE_MEASURED_r11.json"))
carried = []
for name, rows in r11["families"].items():
    if name in fams:
        continue
    carried.append(name)
    fams[name] = rows

doc = {
    "run": "round-12 measurement assembly",
    "round": 12,
    "host": r11.get("host", "local[32] 128GiB"),
    "note": "fresh: slot_policy (joint K x np x cut surface, decorr + "
            "slot-aligned geometries; SlotPolicy pinned from the "
            "aligned >=0.9 bracket at 1.6% scored), slot_drift "
            "(batch-level slot imbalance sees collapse drift at 0.375 "
            "while the dedup-shielded index face stays ~0.02; "
            "slotRetrain arm), attr_bucketed (6 -> 4 exchanges against "
            "the bucketed attribution projection). Carried from r11 "
            "unchanged: " + ", ".join(sorted(carried)),
    "families": {k: v for k, v in sorted(fams.items())},
}
json.dump(doc, open(out, "w"), indent=1)
print(f"wrote {out}: fresh={sorted(set(fams) - set(carried))} "
      f"carried={len(carried)}")
