#!/usr/bin/env python3
"""Assemble SCALE_MEASURED_r7.json from the round-7 rehearsal logs.

Usage: python3 tools/assemble_scale_r7.py <curate_log> <semantic_log> [out]

Collects every JSON measurement line (families curate_ingest,
curate_compact, semantic_ingest_drift) emitted by
graft.bench.CurateRehearsal / graft.bench.SemanticRehearsal, strips the
sbt log prefix, and writes the r7 artifact with a provenance header.
"""
import json
import re
import sys

FAMILIES = ("curate_ingest", "curate_compact", "semantic_ingest_drift")


def lines_of(path):
    out = []
    with open(path) as f:
        for raw in f:
            m = re.search(r'\{"family":"(?:%s)".*\}' % "|".join(FAMILIES), raw)
            if m:
                out.append(json.loads(m.group(0)))
    return out


def main():
    curate_log, semantic_log = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else "SCALE_MEASURED_r7.json"
    rows = lines_of(curate_log) + lines_of(semantic_log)
    by_family = {}
    for r in rows:
        by_family.setdefault(r.pop("family"), []).append(r)
    artifact = {
        "run": "graft.bench.CurateRehearsal + graft.bench.SemanticRehearsal",
        "round": 7,
        "host": "local[32]",
        "note": (
            "curate_ingest: 50-batch CurateStream ingest at sf0.1, variants "
            "none (never compact) vs every10 (Layout.compactStatic on all four "
            "index entities every 10 batches); files = data files across the "
            "four stores after the batch's ingest (pre-compaction on "
            "compaction batches); curate_compact rows time each compaction "
            "pass. semantic_ingest_drift: SemanticStream under a "
            "ramp-then-settle domain shift (mode=shift: orthonormal "
            "sign-flip, spread preserved; mode=collapse: 1-in-8-dim "
            "subspace), K=32 trained on the base distribution, one retrain "
            "at batch 16; recall = planted +/-60% canary twins (cos~0.86) "
            "flagged dup; probe_candidates = batch x corpus cell-join volume "
            "+ batch-internal pairs."
        ),
        "families": by_family,
    }
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    for fam, rs in by_family.items():
        print(f"{fam}: {len(rs)} rows")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
