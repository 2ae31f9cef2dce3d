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
    latest, baseline = _load(LATEST), _load(BASELINE)
    if latest.get("backend") != baseline.get("backend"):
        print(
            f"WARNING: backend mismatch — latest={latest.get('backend')} vs "
            f"baseline={baseline.get('backend')}; speedups compare different "
            "hardware (re-promote a baseline on this backend with "
            "`run.py baseline`)",
            file=sys.stderr,
        )
    sp = _speedups(latest, baseline)
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


def _geomean(values) -> float:
    vals = [v for v in values if v > 0]
    if not vals:
        return float("nan")
    return math.exp(sum(math.log(v) for v in vals) / len(vals))


def _sparkline(series, width=160, height=28) -> str:
    """Inline SVG sparkline of a time series (lower = faster = better)."""
    if len(series) < 2:
        return f"<code>{series[0] * 1e3:.2f} ms</code>" if series else ""
    lo, hi = min(series), max(series)
    span = (hi - lo) or 1.0
    n = len(series)
    pts = " ".join(
        f"{i * (width - 4) / (n - 1) + 2:.1f},"
        f"{height - 3 - (height - 8) * (v - lo) / span:.1f}"
        for i, v in enumerate(series)
    )
    last_x = (n - 1) * (width - 4) / (n - 1) + 2
    last_y = height - 3 - (height - 8) * (series[-1] - lo) / span
    return (
        f'<svg width="{width}" height="{height}">'
        f'<polyline points="{pts}" fill="none" stroke="#36c" stroke-width="1.5"/>'
        f'<circle cx="{last_x:.1f}" cy="{last_y:.1f}" r="2.5" fill="#36c"/></svg>'
    )


def cmd_dashboard(args) -> int:
    """Longitudinal per-module dashboard over the run_*.json history.

    The reference's dashboard view (``benchmarks/dashboard.py`` +
    ``data.py``): per-module summary cards with geomean trends across run
    history, a latest-vs-baseline comparison when a baseline exists, and
    per-benchmark sparklines.
    """
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

    baseline = _load(BASELINE) if os.path.exists(BASELINE) else None

    # ---- per-module grouping: "module.Component[scale]" -> module
    modules: dict = {}
    for k in histories:
        modules.setdefault(k.split(".", 1)[0], []).append(k)

    # ---- module summary: geomean trend (first run -> latest) + vs baseline
    mod_rows = []
    for mod in sorted(modules):
        keys = modules[mod]
        trends, base_sp = [], []
        series_by_run: dict = {}
        for k in keys:
            hist = histories[k]
            if len(hist) >= 2 and hist[-1][1] > 0:
                trends.append(hist[0][1] / hist[-1][1])
            for fname, v in hist:
                series_by_run.setdefault(fname, []).append(v)
            if baseline and k in baseline["results"] and hist[-1][1] > 0:
                base_sp.append(baseline["results"][k]["median_s"] / hist[-1][1])
        # module geomean-median per run -> sparkline of the module trend
        mod_series = [_geomean(series_by_run[f]) for f, _ in meta if f in series_by_run]
        trend = _geomean(trends) if trends else float("nan")
        vs_base = _geomean(base_sp) if base_sp else float("nan")
        mod_rows.append(
            f"<tr><td><a href='#{mod}'>{mod}</a></td><td>{len(keys)}</td>"
            f"<td>{trend:.2f}x</td>"
            f"<td>{'' if math.isnan(vs_base) else f'{vs_base:.2f}x'}</td>"
            f"<td>{_sparkline(mod_series)}</td></tr>"
        )

    # ---- per-benchmark detail tables, one section per module
    sections = []
    for mod in sorted(modules):
        rows = []
        for k in sorted(modules[mod]):
            hist = histories[k]
            series = [v for _, v in hist]
            latest = series[-1]
            trend = series[0] / latest if latest else float("nan")
            vs_base = ""
            if baseline and k in baseline["results"] and latest > 0:
                vs_base = f"{baseline['results'][k]['median_s'] / latest:.2f}x"
            rows.append(
                f"<tr><td>{k}</td><td>{latest * 1e3:.3f} ms</td>"
                f"<td>{trend:.2f}x</td><td>{vs_base}</td>"
                f"<td>{_sparkline(series)}</td></tr>"
            )
        sections.append(
            f"<h2 id='{mod}'>{mod}</h2><table><tr><th>benchmark</th>"
            "<th>latest median</th><th>vs first run</th><th>vs baseline</th>"
            f"<th>history ({len(runs)} runs)</th></tr>" + "".join(rows) + "</table>"
        )

    all_trends = [
        h[0][1] / h[-1][1] for h in histories.values() if len(h) >= 2 and h[-1][1] > 0
    ]
    overall = _geomean(all_trends) if all_trends else float("nan")
    run_list = "".join(
        f"<li><code>{f}</code> ({b})</li>" for f, b in meta[-10:]
    )
    html = (
        "<html><head><title>torchebm_tpu benchmarks</title><style>"
        "body{font-family:sans-serif;margin:2em;max-width:70em}"
        "table{border-collapse:collapse;margin-bottom:1.5em}"
        "td,th{border:1px solid #ccc;padding:4px 10px;text-align:left}"
        "th{background:#f5f5f5}h2{margin-top:1.5em}</style></head>"
        f"<body><h1>torchebm_tpu benchmarks</h1>"
        f"<p>{len(runs)} runs; latest backend: {meta[-1][1]}; overall geomean "
        f"trend (first→latest): <b>{overall:.2f}x</b>"
        + (" — baseline loaded" if baseline else " — no baseline.json")
        + "</p>"
        "<h2>Modules</h2><table><tr><th>module</th><th>benchmarks</th>"
        "<th>geomean trend</th><th>geomean vs baseline</th><th>trend</th></tr>"
        + "".join(mod_rows)
        + "</table>"
        + "".join(sections)
        + f"<h2>Runs</h2><ul>{run_list}</ul></body></html>"
    )
    out = os.path.join(RESULTS_DIR, "dashboard.html")
    with open(out, "w") as f:
        f.write(html)
    print(
        f"dashboard -> {out} ({len(runs)} runs, {len(histories)} benchmarks, "
        f"{len(modules)} modules)"
    )
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
