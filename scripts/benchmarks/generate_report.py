"""Benchmark report generator (reference scripts/benchmarks/
generate_report.py: W&B runs -> HTML dashboard). Here: collect the JSON
lines produced by measure_throughput.py / bench.py runs (one file or
stdin), render a static HTML dashboard with a throughput table and
per-metric history sparklines. No external deps.

Usage:
    python scripts/benchmarks/generate_report.py results/*.jsonl -o report.html
"""

from __future__ import annotations

import argparse
import datetime
import html
import json
import sys
from pathlib import Path


def load_records(paths: list[str]) -> list[dict]:
    records = []
    files = [Path(p) for p in paths] if paths else []
    if not files:
        records = [json.loads(l) for l in sys.stdin if l.strip()]
    for f in files:
        for line in f.read_text().splitlines():
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            rec.setdefault("source", f.name)
            records.append(rec)
    return records


def _spark(values: list[float], width=240, height=36) -> str:
    if len(values) < 2:
        return ""
    lo, hi = min(values), max(values)
    rng = (hi - lo) or 1.0
    pts = " ".join(
        f"{i * width / (len(values) - 1):.1f},"
        f"{height - 4 - (v - lo) / rng * (height - 8):.1f}"
        for i, v in enumerate(values)
    )
    return (
        f'<svg width="{width}" height="{height}">'
        f'<polyline fill="none" stroke="#3366cc" stroke-width="1.5" '
        f'points="{pts}"/></svg>'
    )


def render(records: list[dict]) -> str:
    by_metric: dict[str, list[dict]] = {}
    for r in records:
        by_metric.setdefault(r.get("metric", "?"), []).append(r)
    rows = []
    for metric, recs in sorted(by_metric.items()):
        vals = [float(r.get("value", 0)) for r in recs]
        latest = recs[-1]
        rows.append(
            "<tr>"
            f"<td>{html.escape(metric)}</td>"
            f"<td>{latest.get('value')}</td>"
            f"<td>{html.escape(str(latest.get('unit', '')))}</td>"
            f"<td>{latest.get('vs_baseline', '')}</td>"
            f"<td>{_spark(vals)}</td>"
            "</tr>"
        )
    stamp = datetime.datetime.now().isoformat(timespec="seconds")
    return f"""<!doctype html><html><head><meta charset="utf-8">
<title>mjlab_tpu benchmarks</title>
<style>body{{font-family:sans-serif;margin:2em}}table{{border-collapse:collapse}}
td,th{{border:1px solid #ccc;padding:6px 12px;text-align:left}}</style>
</head><body>
<h1>mjlab_tpu benchmark dashboard</h1>
<p>generated {stamp} · {len(records)} records</p>
<table><tr><th>metric</th><th>latest</th><th>unit</th><th>vs baseline</th>
<th>history</th></tr>
{''.join(rows)}
</table></body></html>"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="*", help="jsonl files (default stdin)")
    ap.add_argument("-o", "--output", default="benchmark_report.html")
    args = ap.parse_args()
    records = load_records(args.inputs)
    Path(args.output).write_text(render(records))
    print(f"wrote {args.output} ({len(records)} records)")


if __name__ == "__main__":
    main()
