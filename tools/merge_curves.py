#!/usr/bin/env python3
"""Merge ScaleBench invocations into the published curve table.

Each ScaleBench run writes per-operator per-multiplier MIN-of-two-sweeps
times. The published docs/scale_curves.json is the per-point MIN over all
recorded invocations (the host shows multi-minute contention windows that
inflate whichever samples they land on; a min across interleaved sweeps
from separate invocations is the only robust estimator observed to work).
This tool folds new run JSONs into the published table: point = min over
inputs, exponent refit by least squares on (ln m, ln t).

Usage: merge_curves.py published.json run1.json [run2.json ...] > merged.json
Ops present only in some inputs keep the points they have.
"""
import json
import math
import sys


def main() -> None:
    tables = []
    for p in sys.argv[1:]:
        with open(p) as f:
            tables.append(json.load(f))
    # carry provenance ("method") alongside the numeric meta — a merged
    # artifact without its methodology note reads as unexplained numbers
    meta = {k: tables[0][k] for k in ("base", "cpus", "method") if k in tables[0]}
    ops: dict[str, dict[str, float]] = {}
    for t in tables:
        for op, row in t.items():
            if not isinstance(row, dict):
                continue
            dst = ops.setdefault(op, {})
            for pt, v in row.items():
                if pt == "exponent":
                    continue
                dst[pt] = min(dst.get(pt, float("inf")), float(v))
    out = dict(meta)
    for op, pts in ops.items():
        xs = [math.log(float(pt.rstrip("x"))) for pt in pts]
        ys = [math.log(v) for v in pts.values()]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        den = sum((x - mx) ** 2 for x in xs)
        row = {pt: round(v, 3) for pt, v in pts.items()}
        # a single data point can't support a fit: publish null, not a
        # fake 0.0 that would read as perfectly flat scaling
        if den:
            b = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / den
            row["exponent"] = round(b, 3)
        else:
            row["exponent"] = None
        out[op] = row
    json.dump(out, sys.stdout)
    print()


if __name__ == "__main__":
    main()
