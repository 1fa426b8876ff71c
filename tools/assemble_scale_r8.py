#!/usr/bin/env python3
"""Assemble SCALE_MEASURED_r8.json: the consolidated round-8 ScaleLaws
matrix + the fresh 20-batch CurateRehearsal (re-attesting the fixed
KeySketch riding the maintenance loop) + carried-over rehearsal
families from round 7 whose code did not change this round
(semantic_ingest_drift, serve_path, jl_distortion).

The sq_scan_q160 / sq_rerank_q161 rows from the first consolidated run
measured the HOF formulation (21.1 s at n=32k); they are REPLACED by
the native-kernel re-measurement rows passed in via --sq-rows."""
import json, re, sys, collections

scalelaws_log = sys.argv[1]
curate_log = sys.argv[2]
sq_rows_json = sys.argv[3]  # file with the native-kernel re-measured rows
out = sys.argv[4]

fams = collections.defaultdict(list)


def ingest(path, keep=None):
    for line in open(path):
        m = re.search(r'\{"family".*\}', line)
        if not m:
            continue
        row = json.loads(m.group(0))
        name = row.pop("family")
        if keep and not keep(name):
            continue
        fams[name].append(row)


ingest(scalelaws_log)
ingest(curate_log)
# replace HOF-era sq rows with the native-kernel re-measurement
for row in json.load(open(sq_rows_json)):
    name = row.pop("family")
    fams[name] = [r for r in fams[name] if r.get("factor") != row.get("factor")]
    fams[name].append(row)
for name in ("sq_scan_q160", "sq_rerank_q161"):
    fams[name].sort(key=lambda r: r["factor"])

r7 = json.load(open("/root/repo/SCALE_MEASURED_r7.json"))
for carried in ("semantic_ingest_drift", "serve_path", "jl_distortion"):
    fams[carried] = r7["families"][carried]

artifact = {
    "run": "graft.bench.ScaleLaws (consolidated idle run, 96 rows) + "
           "CurateRehearsal 20x5 (fresh, fixed KeySketch) + carried r7 "
           "rehearsal families (semantic_ingest_drift / serve_path / "
           "jl_distortion - code unchanged in r8)",
    "round": 8,
    "host": "local[32]",
    "note": (
        "Round-8 laws on top of the reproduced r7 matrix (candidate/pair "
        "columns deterministic - spot-agree with r7 bit-for-bit, e.g. "
        "simhash_narrow f16 = 27,263,460; pq rerank 528/3300): "
        "(1) the compression ladder measured at equal candidate volume "
        "(10.56M pairs, n=32k): exact 2.54 s / SQ8 1.86 s / PQ-ADC 2.01 s "
        "- both compressed scans are CPU-parity-or-better, the dividend "
        "is state size (8x / 64x); SQ's first HOF formulation measured "
        "21.1 s (interpreted lambdas outside codegen) and was replaced "
        "by native kernels, rows here are the native ones. "
        "(2) sq_rerank recall@10 through a 100-row prefilter is TOTAL "
        "(210/830/3300 of 210/830/3300) at every n while pq_rerank holds "
        "528/3300 - the training-free 8x rung keeps per-dim resolution "
        "the 64x rung gives up. "
        "(3) zorder_skip: y-band touched rows 863/3443/13750 of "
        "5k/20k/80k (17%/17%/17% - the n/8 band fraction plus file-"
        "boundary slack) vs the x-major layout's FULL scan (pairs column "
        "= n at every factor). "
        "(4) unigram_lm: one count agg + posting join, 0.76/2.51/3.94 s "
        "at 271k/1.08M/4.33M token instances - linear. "
        "(5) curate_ingest/compact re-measured FRESH on the r8 KeySketch "
        "(fpp persisted in the header, geometry-compatible batch merges, "
        "CRC-validated images): sketch-every10 still at parity with "
        "every10, saturation rebuild riding the compaction window - the "
        "r7 advice crash (IncompatibleMergeException on bitSize-derived "
        "batch filters) is structurally gone, KeySketchSpec pins the "
        "repro. Horizon is 20 batches here; r7's 50-batch rows remain "
        "the long-horizon law."),
    "families": dict(fams),
}
json.dump(artifact, open(out, "w"), indent=1)
print(f"wrote {out}: {len(fams)} families, "
      f"{sum(len(v) for v in fams.values())} rows")
