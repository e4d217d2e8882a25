#!/usr/bin/env python3
"""Dump .explain("formatted") for declared queries to a directory.

Usage: python tools/plan_capture.py OUTDIR [SUFFIX] [q1,q2,...]

Writes OUTDIR/<query>_<SUFFIX>.txt (default suffix "before") -- the
round's plan-evidence artifacts (plans/r12/...). Captured at
$SPARK_GRAFT_SF_DIR (default sf0.1) so size estimates and broadcast
decisions match the bench configuration.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_ad_analytics_spark.session import build_session  # noqa: E402


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        raise SystemExit(
            "usage: plan_capture.py OUTDIR [SUFFIX] [q1,q2,...]"
        )
    outdir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)

    spark = build_session(
        app_name="plan-capture",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    if names is None:
        names = list(qs)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            # public API only (r12 ADVICE): explain() prints; capture
            # its stdout instead of reaching into the JVM internals
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001 -- capture failures loudly
            plan = f"PLAN CAPTURE FAILED: {e!r}\n"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
