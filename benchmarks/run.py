#!/usr/bin/env python
"""Benchmark orchestrator: run, save versioned results, compare, gate, dashboard.

The ``run.sh`` equivalent of the reference harness (``benchmarks/run.sh``):

    python benchmarks/run.py run [--scales small,medium] [--module samplers]
    python benchmarks/run.py baseline              # promote latest -> baseline
    python benchmarks/run.py compare [--gate 0.95] # geomean speedup vs baseline
    python benchmarks/run.py dashboard             # static HTML report

``compare --gate`` exits non-zero when the geometric-mean speedup vs the saved
baseline drops below the threshold (the reference's CI regression gate,
``run.sh:226-258``).
"""

from __future__ import annotations

import argparse
import datetime
import json
import math
import os
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
RESULTS_DIR = os.path.join(HERE, "results")
LATEST = os.path.join(RESULTS_DIR, "latest.json")
BASELINE = os.path.join(RESULTS_DIR, "baseline.json")


def _load(path):
    with open(path) as f:
        return json.load(f)


def cmd_run(args) -> int:
    cmd = [
        sys.executable, "-m", "pytest", HERE, "-q", "-p", "no:cacheprovider",
        f"--bench-scales={args.scales}",
    ]
    if args.module:
        cmd.append(f"--bench-module={args.module}")
    if args.device:
        cmd.append(f"--bench-device={args.device}")
    rc = subprocess.call(cmd, cwd=HERE)
    if rc == 0 and os.path.exists(LATEST):
        stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
        shutil.copy(LATEST, os.path.join(RESULTS_DIR, f"run_{stamp}.json"))
        data = _load(LATEST)
        print(f"saved {len(data['results'])} benchmark results ({data['backend']})")
    return rc


def cmd_baseline(args) -> int:
    if not os.path.exists(LATEST):
        print("no latest.json; run benchmarks first", file=sys.stderr)
        return 1
    shutil.copy(LATEST, BASELINE)
    print(f"baseline <- {LATEST}")
    return 0


def _speedups(latest, baseline):
    common = set(latest["results"]) & set(baseline["results"])
    out = {}
    for k in sorted(common):
        base = baseline["results"][k]["median_s"]
        new = latest["results"][k]["median_s"]
        out[k] = base / new  # >1 = faster than baseline
    return out


def cmd_compare(args) -> int:
    if not (os.path.exists(LATEST) and os.path.exists(BASELINE)):
        print("need both latest.json and baseline.json", file=sys.stderr)
        return 1
    sp = _speedups(_load(LATEST), _load(BASELINE))
    if not sp:
        print("no common benchmarks", file=sys.stderr)
        return 1
    for k, v in sorted(sp.items(), key=lambda kv: kv[1]):
        print(f"{v:6.2f}x  {k}")
    geomean = math.exp(sum(math.log(v) for v in sp.values()) / len(sp))
    print(f"geomean speedup: {geomean:.3f}x over {len(sp)} benchmarks")
    if geomean < args.gate:
        print(f"REGRESSION: geomean {geomean:.3f} < gate {args.gate}", file=sys.stderr)
        return 2
    return 0


def cmd_dashboard(args) -> int:
    runs = sorted(
        f for f in os.listdir(RESULTS_DIR) if f.startswith("run_") and f.endswith(".json")
    ) if os.path.isdir(RESULTS_DIR) else []
    if not runs:
        print("no runs to report", file=sys.stderr)
        return 1
    histories: dict = {}
    meta = []
    for fname in runs:
        data = _load(os.path.join(RESULTS_DIR, fname))
        meta.append((fname, data.get("backend", "?")))
        for k, v in data["results"].items():
            histories.setdefault(k, []).append((fname, v["median_s"]))

    rows = []
    for k in sorted(histories):
        hist = histories[k]
        latest = hist[-1][1]
        first = hist[0][1]
        trend = first / latest if latest else float("nan")
        spark = " ".join(f"{t * 1e3:.2f}" for _, t in hist[-8:])
        rows.append(
            f"<tr><td>{k}</td><td>{latest * 1e3:.3f} ms</td>"
            f"<td>{trend:.2f}x</td><td><code>{spark}</code></td></tr>"
        )
    html = (
        "<html><head><title>torchebm_tpu benchmarks</title><style>"
        "body{font-family:sans-serif;margin:2em}table{border-collapse:collapse}"
        "td,th{border:1px solid #ccc;padding:4px 10px;text-align:left}</style></head>"
        f"<body><h1>torchebm_tpu benchmarks</h1><p>{len(runs)} runs; latest backend: "
        f"{meta[-1][1]}</p><table><tr><th>benchmark</th><th>latest median</th>"
        "<th>vs first run</th><th>history (ms)</th></tr>"
        + "".join(rows)
        + "</table></body></html>"
    )
    out = os.path.join(RESULTS_DIR, "dashboard.html")
    with open(out, "w") as f:
        f.write(html)
    print(f"dashboard -> {out}")
    return 0


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    pr = sub.add_parser("run")
    pr.add_argument("--scales", default="small")
    pr.add_argument("--module", default="")
    pr.add_argument("--device", default="")
    sub.add_parser("baseline")
    pc = sub.add_parser("compare")
    pc.add_argument("--gate", type=float, default=0.95)
    sub.add_parser("dashboard")
    args = p.parse_args()
    return {
        "run": cmd_run,
        "baseline": cmd_baseline,
        "compare": cmd_compare,
        "dashboard": cmd_dashboard,
    }[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
