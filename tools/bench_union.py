#!/usr/bin/env python3
"""Merge N full-catalog Bench detail files into ONE representative
round artifact (the r12-verdict task: the committed BENCH_rNN_local.json
must carry the min-per-query UNION across ALL clean runs of the round,
plus every run's total, instead of whichever single run happened to be
committed last — r12 committed the slowest of a 258.8-306.8s band and
cross-round totals read as a phantom 23% regression).

Usage: python3 tools/bench_union.py OUT.json RUN1.json RUN2.json [...]

Semantics:
  - queries:        per-query min over the union of every run's retained
                    samples (per_pass lists, already contamination-
                    screened by Bench itself)
  - per_pass:       per-query concatenation of all runs' samples
  - run_totals:     concatenation, each entry tagged with its source run
  - jvm_per_pass,
    calibration_sec, loadavg: concatenated evidence
  - plan_fp / plan_fp_strict: taken from run 1; every other run's map is
                    DIFFED against it — primary-fp disagreement between
                    same-code runs makes the union unsound (different
                    plans timed), so it aborts; strict-fp disagreement is
                    reported (bistable AQE picks are expected there)
  - scalars (sf, failed, contaminated_passes, ...): from run 1, with
    failed/contaminated unioned across runs
The output keeps the exact key layout Bench writes so downstream fp-diff
parsing (Bench's own prev-round lookup, the judge's tooling) reads it
like a native artifact.
"""
import json
import sys


def main() -> int:
    if len(sys.argv) < 4:
        print(__doc__.strip())
        return 2
    out_path, run_paths = sys.argv[1], sys.argv[2:]
    runs = []
    for p in run_paths:
        with open(p) as f:
            runs.append((p, json.load(f)))
    base_path, base = runs[0]

    # fp soundness gate: a min-union across runs whose PRIMARY plans
    # differ would time two different plans under one query name
    fp_notes = {"primary_mismatch": [], "strict_mismatch": []}
    for p, r in runs[1:]:
        for q, fp in base.get("plan_fp", {}).items():
            other = r.get("plan_fp", {}).get(q, "")
            if fp and other and fp != other:
                fp_notes["primary_mismatch"].append({"query": q, "run": p})
        for q, fp in base.get("plan_fp_strict", {}).items():
            other = r.get("plan_fp_strict", {}).get(q, "")
            if fp and other and fp != other:
                fp_notes["strict_mismatch"].append({"query": q, "run": p})
    if fp_notes["primary_mismatch"]:
        print("ABORT: primary plan_fp differs between runs — the union "
              "would mix plans:\n" +
              json.dumps(fp_notes["primary_mismatch"], indent=2))
        return 1

    names = sorted({q for _, r in runs for q in r.get("queries", {})})
    failed = sorted({q for _, r in runs for q in r.get("failed", [])})
    per_pass = {}
    queries = {}
    for q in names:
        samples = [s for _, r in runs
                   for s in r.get("per_pass", {}).get(q, [])]
        per_pass[q] = samples
        queries[q] = -1.0 if (q in failed or not samples) else min(samples)

    run_totals = []
    jvm = []
    calib = []
    loads = []
    for p, r in runs:
        for e in r.get("run_totals", []):
            run_totals.append({**e, "run": p})
        for e in r.get("jvm_per_pass", []):
            jvm.append({**e, "run": p})
        calib += r.get("calibration_sec", [])
        loads += r.get("loadavg", [])

    total = sum(v for v in queries.values() if v >= 0)
    out = dict(base)  # keep base's scalar fields / key layout
    out.update({
        "queries": queries,
        "per_pass": per_pass,
        "plan_fp": base.get("plan_fp", {}),
        "plan_fp_strict": base.get("plan_fp_strict", {}),
        "passes": sum(r.get("passes", 0) for _, r in runs),
        "pass_counts": {q: len(per_pass[q]) for q in names},
        "calibration_sec": calib,
        "loadavg": loads,
        "run_totals": run_totals,
        "jvm_per_pass": jvm,
        "failed": failed,
        "contaminated_passes": sorted({c for _, r in runs
                                       for c in r.get("contaminated_passes", [])}),
        "union_of_runs": [p for p, _ in runs],
        "fp_cross_run": {"primary_mismatch": [],
                         "strict_mismatch": fp_notes["strict_mismatch"]},
        "value": round(total, 4),
    })
    with open(out_path, "w") as f:
        json.dump(out, f)
    strict_n = len(fp_notes["strict_mismatch"])
    print(f"wrote {out_path}: {len(names)} queries, total={total:.1f}s, "
          f"runs={len(runs)}, strict_fp_cross_run_mismatches={strict_n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
