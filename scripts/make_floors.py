#!/usr/bin/env python3
"""Regenerate src/main/resources/bench_floors.tsv from a CONTROLLED
BENCH_DETAIL.json (Bench run alone on an otherwise idle box).

Usage: python3 scripts/make_floors.py <bench_detail.json> [<label>]

Writes name<TAB>min_seconds per catalog query plus a `_calib` pseudo-entry
(the session's CalibProbe mean) so graft.Bench's elevated-minimum detector
can report both yardsticks. `_shared_warmup` is excluded: it is a
one-time build, not a steady-state floor.
"""
import json, sys, datetime

def main(path, label):
    d = json.load(open(path))
    calib = sum(d["calib_sec"]) / len(d["calib_sec"])
    lines = [
        "# Per-query expected-min floors for graft.Bench's elevated-minimum",
        f"# detector. Source: {label} (total={d['value']:.2f}s,"
        f" calib_mean={calib:.3f}s, sf={d['sf']}).",
        f"# Generated {datetime.date.today().isoformat()} by"
        " scripts/make_floors.py — regenerate after query-code or catalog"
        " changes.",
        f"_calib\t{calib:.4f}",
    ]
    for name, sec in sorted(d["queries_min"].items()):
        if name.startswith("_") or sec < 0:
            continue
        lines.append(f"{name}\t{sec:.4f}")
    out = "src/main/resources/bench_floors.tsv"
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(lines) - 4} query floors, _calib={calib:.3f}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else sys.argv[1])
