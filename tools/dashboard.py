#!/usr/bin/env python3
"""Terminal dashboard over the engine's output bus.

The reference documents (but does not ship) a Streamlit app consuming
its three output topics with kafka-python + pandas
(`/root/reference/README.md:36-39,102-122`: periodic poll of
ctr_results / engagement_results / anomaly_alerts, tabular + chart
display). This is that output-consumption surface for the Spark
engine's bus: it polls the sink directories (the parquet-dir bus the
streaming jobs write through `streaming/sinks.py::to_parquet_dir` /
`dual_sink`; point it at Kafka-materialized tables on a real cluster)
and renders the same three panels as text tables + a JSON payload any
real dashboard can consume.

Pure consumer: reads with pandas (the sink dirs are small, recent
aggregates -- the 100 TB never flows through a dashboard), never
locks or mutates the bus, tolerates partially-written directories.

Usage:  python3 tools/dashboard.py BUS_DIR [--watch SECONDS] [--json]
        BUS_DIR contains ctr_results/ engagement_results/
        anomaly_alerts/ (missing panels render as empty).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time

import pandas as pd

PANELS = {
    "ctr_results": ("window_start", ["campaign_id", "impression_count",
                                     "click_count", "ctr"]),
    "engagement_results": ("window_start", ["device_type", "impression_count",
                                            "click_count", "ctr"]),
    "anomaly_alerts": ("alert_time", ["campaign_id", "alert_type",
                                      "current_ctr", "previous_ctr"]),
}


#: newest files read in full per poll; older output only contributes
#: to the footer-derived total, so poll cost stays bounded as a
#: streaming sink grows.
MAX_FILES_READ = 16


def read_panel(bus_dir: str, name: str) -> tuple[pd.DataFrame, int]:
    """(recent rows, total row count). Totals come from parquet
    FOOTERS (no data pages), rows from only the newest MAX_FILES_READ
    files by mtime -- a dashboard poll must not re-read a day of
    streaming output to render 12 tail rows."""
    import pyarrow.parquet as pq

    files = sorted(
        glob.glob(os.path.join(bus_dir, name, "*.parquet")),
        key=os.path.getmtime,
    )
    total = 0
    for f in files:
        try:
            total += pq.ParquetFile(f).metadata.num_rows
        except Exception:  # half-written file during an active trigger
            continue
    frames = []
    for f in files[-MAX_FILES_READ:]:
        try:
            frames.append(pd.read_parquet(f))
        except Exception:
            continue
    if not frames:
        return pd.DataFrame(), total
    return pd.concat(frames, ignore_index=True), total


def snapshot(bus_dir: str, tail: int = 12) -> dict:
    """One poll: per panel, the latest `tail` rows (time-ordered) plus
    rollup counts -- the JSON a web dashboard would fetch."""
    out: dict = {"bus_dir": bus_dir, "panels": {}}
    for name, (time_col, cols) in PANELS.items():
        df, total = read_panel(bus_dir, name)
        if df.empty:
            out["panels"][name] = {"rows": [], "n_total": int(total)}
            continue
        if time_col in df.columns:
            df = df.sort_values(time_col, kind="stable")
        keep = [c for c in [time_col, *cols] if c in df.columns]
        recent = df[keep].tail(tail)
        out["panels"][name] = {
            "rows": json.loads(recent.to_json(orient="records",
                                              date_format="iso")),
            "n_total": int(total),
        }
    return out


def render(snap: dict) -> str:
    lines = [f"== bus: {snap['bus_dir']} =="]
    for name, panel in snap["panels"].items():
        lines.append(f"\n-- {name} ({panel['n_total']} rows total) --")
        if not panel["rows"]:
            lines.append("(empty)")
            continue
        df = pd.DataFrame(panel["rows"])
        lines.append(df.to_string(index=False, max_colwidth=24))
    return "\n".join(lines)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("bus_dir")
    ap.add_argument("--watch", type=float, default=None,
                    help="re-poll every N seconds (the reference app's loop)")
    ap.add_argument("--json", action="store_true", dest="as_json")
    args = ap.parse_args()
    while True:
        snap = snapshot(args.bus_dir)
        print(json.dumps(snap) if args.as_json else render(snap), flush=True)
        if args.watch is None:
            break
        time.sleep(args.watch)


if __name__ == "__main__":
    main()
