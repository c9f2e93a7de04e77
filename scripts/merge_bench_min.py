#!/usr/bin/env python3
"""Merge N full-bench JSON records into a per-query-min record.

Usage: python3 scripts/merge_bench_min.py out.json runA.json runB.json [...]

Used at round close to produce the quiet-host min-of-N record the next
round diffs against (scripts/bench_prev.json). All inputs must be full
runs of the same query set at the same scale factor on the same code;
the per-query minimum trims one-off host-noise spikes that a single
pass carries. The emitted record keeps the Bench JSON shape (metric /
value / queries / sf) plus a `merged_from` count and the min canary
across inputs (the fairest per-core-speed statement for the merged
timings). Driver-side tooling only — not part of the library.
"""
import json
import sys


def main() -> None:
    out, *paths = sys.argv[1:]
    runs = [json.load(open(p)) for p in paths]
    sfs = {r["sf"] for r in runs}
    assert len(sfs) == 1, f"mixed scale factors: {sfs}"
    names = set(runs[0]["queries"])
    for r in runs[1:]:
        assert set(r["queries"]) == names, "query sets differ across runs"
    queries = {q: min(r["queries"][q] for r in runs) for q in sorted(names)}
    rec = {
        "metric": "total",
        "value": sum(queries.values()),
        "unit": "sec",
        "queries": queries,
        "sf": sfs.pop(),
        "merged_from": len(runs),
    }
    canaries = [r["canary_sec"] for r in runs if "canary_sec" in r]
    if canaries:
        rec["canary_sec"] = min(canaries)
    # Provenance (round-10 advice): a min-of-N merge must not DROP the
    # bracketed canary quartets and protocol maps its inputs carried —
    # they are what lets a later round attribute a per-query mover to a
    # host episode instead of guessing. Each input's non-query metadata
    # travels verbatim in `inputs`, keyed by source path.
    rec["inputs"] = [
        {"path": p, **{k: v for k, v in r.items() if k != "queries"}}
        for p, r in zip(paths, runs)
    ]
    json.dump(rec, open(out, "w"))
    print(f"wrote {out}: {rec['value']:.1f} s over {len(queries)} queries "
          f"(min of {len(runs)} runs)"
          + (f", canary {rec['canary_sec']:.2f} s" if canaries else ""))


if __name__ == "__main__":
    main()
