"""Plan-digest regression gate: flagship queries' physical-plan shape
must match the committed `.benchmarks/plan_audit.json` artifact.

tools/plan_audit.py records per-query shuffle/broadcast/scan/sort/
py-stage counts; this test enforces the artifact for a flagship
subset, so a plan regression (a new shuffle sneaking into ctr_hourly,
a Python stage appearing in a codegen path) fails CI instead of only
showing up as a diff nobody reruns. After an INTENTIONAL plan change,
re-run `python3 tools/plan_audit.py` and commit the refreshed
artifact alongside the code."""

from __future__ import annotations

import json

import pytest

from tests.conftest import SF_CORRECT

#: One query per engine subsystem: relational core, TPC-H shapes,
#: window functions, dedup family, ANN, text, curation, multimodal,
#: and the new band-join/classifier/quality paths.
FLAGSHIPS = [
    "ctr_hourly",
    "anomaly_alerts",
    "pricing_summary",
    "shipping_priority",
    "top_revenue_supplier",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "ann_cosine_topk",
    "text_quality",
    "classifier_scores",
    "event_bursts",
    "semantic_dedup",
    "data_quality",
    "multimodal_phash",
    "quality_weighted_sample",
    "curated_corpus",
]


@pytest.fixture(scope="module")
def recorded():
    with open("/root/repo/.benchmarks/plan_audit.json") as f:
        data = json.load(f)
    return data.get("queries", data)


@pytest.fixture(scope="module")
def digest_fn():
    from tools.plan_audit import digest  # same counting logic as the artifact

    return digest


@pytest.mark.parametrize("name", FLAGSHIPS)
def test_flagship_plan_matches_artifact(spark, recorded, digest_fn, name):
    import __spark_entry__ as entry

    assert name in recorded, f"{name} missing from plan_audit.json -- rerun the tool"
    df = entry.queries()[name](spark, SF_CORRECT)
    got = digest_fn(df)
    assert got == recorded[name], (
        f"{name}: plan shape changed vs committed artifact.\n"
        f"  now:      {got}\n"
        f"  recorded: {recorded[name]}\n"
        "If intentional, refresh with `python3 tools/plan_audit.py` and "
        "commit .benchmarks/plan_audit.json."
    )
