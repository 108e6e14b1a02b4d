#!/usr/bin/env python
"""Round-over-round perf regression gate (VERDICT r2 next-step #8).

Compares two benchmark artifacts metric-by-metric and FAILS (exit 1) on any
regression beyond the tolerance — perf claims become diffable artifacts, not
prose.  Accepts either artifact format this repo produces:

  * harness JSONL: one ``{"benchmark": ..., "rate_per_s": ...}`` object per
    line (``python -m icp_tpu.bench.harness > docs/perf/harness_rN.jsonl``)
  * driver BENCH_rN.json: ``{"parsed": {"metric": ..., "value": ...}}``
    (also accepts the bare ``{"metric": ..., "value": ...}`` line bench.py
    prints)

Usage:
    python scripts/perf_gate.py OLD NEW [--tolerance 0.15]

Rates (higher = better) are compared as new/old; a metric present in OLD but
missing in NEW is itself a failure (a silently dropped benchmark reads as
"no regression").  Metrics new in NEW are reported informationally.
"""

from __future__ import annotations

import argparse
import json
import sys


def load_metrics(path: str, attrs: dict | None = None) -> dict[str, float]:
    """-> {name: rate} (higher is better) from any supported artifact.

    ``attrs`` (optional out-param): per-row gate attributes —
    ``{"<name>": {"gate": False}}`` for rows the artifact itself marks
    ungated (uncontrolled context rows), ``{"gate_tolerance": X}`` for rows
    with a row-specific tolerance (e.g. tunnel-RTT-dominated walls)."""
    metrics: dict[str, float] = {}
    with open(path) as f:
        text = f.read()
    # try whole-file JSON first (driver BENCH_rN.json), else JSONL
    records = []
    try:
        obj = json.loads(text)
        records = obj if isinstance(obj, list) else [obj]
    except json.JSONDecodeError:
        for line in text.splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    records.append(json.loads(line))
                except json.JSONDecodeError:
                    continue
    for rec in records:
        if not isinstance(rec, dict):
            continue
        if isinstance(rec.get("parsed"), dict):  # driver wrapper
            rec = rec["parsed"]
        if "benchmark" in rec and "rate_per_s" in rec:  # harness row
            name = rec["benchmark"]
            if rec.get("workload"):
                name = f"{rec['workload']}:{name}"
            metrics[name] = float(rec["rate_per_s"])
            if attrs is not None:
                if rec.get("gate") is False:
                    attrs.setdefault(name, {})["gate"] = False
                if "gate_tolerance" in rec:
                    attrs.setdefault(name, {})["gate_tolerance"] = float(
                        rec["gate_tolerance"])
        elif "metric" in rec and "value" in rec:  # bench.py headline
            if float(rec["value"]) > 0:
                metrics[rec["metric"]] = float(rec["value"])
    return metrics


def compare(old: dict[str, float], new: dict[str, float],
            tolerance: float, skip: list[str] | None = None,
            attrs: dict | None = None) -> int:
    rc = 0
    attrs = attrs or {}
    for name, a in attrs.items():
        if a.get("gate") is False and name in old:
            print(f"skipping {name} (old={old.pop(name):.4g} — artifact "
                  "marks it gate=false: uncontrolled context row)")
            new.pop(name, None)
    for name in skip or []:
        # measurement-protocol fixes produce false regressions (e.g. the r03
        # err_compute rows were 0.1 us FLOORS — r04 measures the real 0.94
        # us); a skip must name the row explicitly and shows in the output
        if name in old:
            print(f"skipping {name} (old={old.pop(name):.4g} — "
                  "explicitly excluded by --skip)")
            new.pop(name, None)
    width = max((len(k) for k in old | new), default=10)
    print(f"{'metric':<{width}}  {'old':>12}  {'new':>12}  {'ratio':>7}  verdict")
    for name in sorted(old):
        if name not in new:
            print(f"{name:<{width}}  {old[name]:>12.4g}  {'MISSING':>12}  "
                  f"{'-':>7}  FAIL (dropped)")
            rc = 1
            continue
        ratio = new[name] / old[name]
        tol = attrs.get(name, {}).get("gate_tolerance", tolerance)
        verdict = "ok"
        if ratio < 1.0 - tol:
            verdict = f"FAIL (-{(1 - ratio) * 100:.1f}%)"
            rc = 1
        elif ratio > 1.0 + tol:
            verdict = f"improved (+{(ratio - 1) * 100:.1f}%)"
        if tol != tolerance:
            verdict += f" [row tolerance {tol:.2f}]"
        print(f"{name:<{width}}  {old[name]:>12.4g}  {new[name]:>12.4g}  "
              f"{ratio:>7.3f}  {verdict}")
    for name in sorted(set(new) - set(old)):
        print(f"{name:<{width}}  {'-':>12}  {new[name]:>12.4g}  {'-':>7}  new")
    return rc


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="perf_gate")
    ap.add_argument("old", help="baseline artifact (JSON or JSONL)")
    ap.add_argument("new", help="candidate artifact (JSON or JSONL)")
    ap.add_argument("--tolerance", type=float, default=0.15,
                    help="allowed fractional rate drop (default 0.15)")
    ap.add_argument("--skip", nargs="*", default=[],
                    help="row names to exclude (for measurement-protocol "
                         "fixes that would read as false regressions)")
    args = ap.parse_args(argv)
    attrs: dict = {}
    old = load_metrics(args.old, attrs)
    new = load_metrics(args.new, attrs)  # either artifact may carry flags
    if not old:
        print(f"no metrics found in {args.old}", file=sys.stderr)
        return 2
    return compare(old, new, args.tolerance, skip=args.skip, attrs=attrs)


if __name__ == "__main__":
    sys.exit(main())
