#!/usr/bin/env python3
"""Rebaseline bench_prev.json from a bench_last.json artifact.

Round-16 VERDICT directive 8: bench_prev must state its measurement
unit. Writes the flat short-id raw map Bench's rerun guard reads, plus
cal_ref / probe_ref (medians of the artifact's interleaved reading
arrays — the per-sweep noise floor estimators) and a cal_unit string
naming both estimators. Short ids are family prefixes; colliding
families (e2e_*) keep their full key, mirroring Bench.shortOf.

Usage: rebaseline_prev.py <bench_last.json> [out=bench_prev.json]
"""
import json
import statistics
import sys


def main(src, out="bench_prev.json"):
    d = json.load(open(src))
    queries = d["queries"]
    fams = {}
    for k in queries:
        fams.setdefault(k.split("_")[0], []).append(k)
    dup = {f for f, ks in fams.items() if len(ks) > 1}

    def short(k):
        f = k.split("_")[0]
        return k if f in dup else f

    lines = ["{"]
    for k in sorted(queries):
        lines.append(f'"{short(k)}": {queries[k]},')
    lines.append(f'"cal_ref": {round(statistics.median(d["cal"]), 3)},')
    lines.append(f'"probe_ref": {round(statistics.median(d["probe"]), 3)},')
    # probe_sf + cal_unit come FROM the artifact (round-17 ADVICE: the
    # unit string must describe the probe that actually ran, and Bench
    # falls back to its in-sweep opening reading when probe_sf differs
    # from the sweep's SF dir) — one source of truth, no hardcoding.
    lines.append(f'"probe_sf": "{d.get("probe_sf", d.get("sf", ""))}",')
    unit = d.get(
        "cal_unit",
        "cal: fixed scalar kernel min-of-2; probe: workload-shaped Spark "
        "job (see bench_last.json)")
    lines.append(
        f'"cal_unit": {json.dumps(unit + "; refs are sweep medians")}')
    lines.append("}")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(queries)} keys, cal_ref/probe_ref from {src} "
          f"(drift {d.get('drift')}, drift_cal {d.get('drift_cal')})")


if __name__ == "__main__":
    main(*sys.argv[1:])
