"""Deterministic reference-parity fixtures.

Reproduces the semantics of the reference's event generator
(`/root/reference/data-generator/generate_events.py`) with a fixed
seed and a virtual clock (the original uses wall-clock now() and
unseeded random -- unusable for tests):

* impressions at 50/s (20 ms apart), campaigns camp-1..10, ads 1..100,
  devices {mobile,desktop,tablet} with some NULLs, browsers, cost
  uniform(0.01, 0.50) 2dp -- generate_events.py:25-29, 67-86
* clicks with probability min(0.6, 0.1 * boost), delay uniform
  500..10000 ms -- generate_events.py:134-151
* camp-1 anomaly phases (generate_events.py:108-121): boost 1.0 for
  t in [0,300s), 0.1 in [300,600s) -> DROP, 4.0 in [600,900s) ->
  SPIKE, 1.0 after.

Plus the edge-case traps from FIXTURES.md §2 that the reference's
workload never produces but its SQL semantics must survive:
multi-click impressions, out-of-band clicks, duplicate click
deliveries, late/out-of-order clicks.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

VIRTUAL_START_MS = 1_704_067_200_000  # 2024-01-01T00:00:00Z
EVENT_RATE = 50  # impressions/s -> 20 ms spacing
CLICK_RATIO = 0.1
MAX_CTR_CAP = 0.6
DEVICES = ["mobile", "desktop", "tablet"]
BROWSERS = ["chrome", "safari", "firefox", "edge"]


#: camp-1 anomaly schedule (generate_events.py:108-121): list of
#: (phase_end_sec, boost). The SINGLE source of truth -- both the
#: scalar form below and the vectorized form in sources/generator.py
#: consume it, so the fixture and the registered source cannot drift.
ANOMALY_PHASES: list[tuple[float, float]] = [
    (300.0, 1.0),
    (600.0, 0.1),  # -> DROP
    (900.0, 4.0),  # -> SPIKE
    (float("inf"), 1.0),
]


def phase_boost(campaign: str, t_sec: float) -> float:
    """camp-1 anomaly schedule; all other campaigns flat 1.0."""
    if campaign != "camp-1":
        return 1.0
    for end, boost in ANOMALY_PHASES:
        if t_sec < end:
            return boost
    return 1.0


@dataclass
class AdFixture:
    impressions: pd.DataFrame
    clicks: pd.DataFrame


def generate(duration_sec: int = 1200, seed: int = 42) -> AdFixture:
    """Deterministic impressions + clicks for ``duration_sec`` of
    virtual time, including the FIXTURES.md edge-case rows."""
    rng = np.random.default_rng(seed)
    n = duration_sec * EVENT_RATE

    offsets_ms = np.arange(n) * (1000 // EVENT_RATE)
    t_sec = offsets_ms / 1000.0
    campaigns = np.array([f"camp-{i}" for i in rng.integers(1, 11, n)])
    imp = pd.DataFrame(
        {
            "impression_id": [f"imp-{i}" for i in range(n)],
            "user_id": [f"user-{u}" for u in rng.integers(1, 10_001, n)],
            "campaign_id": campaigns,
            "ad_id": [f"ad-{a}" for a in rng.integers(1, 101, n)],
            "device_type": [
                None if rng.random() < 0.05 else DEVICES[d]
                for d in rng.integers(0, 3, n)
            ],
            "browser": [BROWSERS[b] for b in rng.integers(0, 4, n)],
            "event_timestamp": VIRTUAL_START_MS + offsets_ms,
            "cost": np.round(rng.uniform(0.01, 0.50, n), 2),
        }
    )

    boosts = np.array([phase_boost(c, t) for c, t in zip(campaigns, t_sec)])
    p_click = np.minimum(MAX_CTR_CAP, CLICK_RATIO * boosts)
    clicked = rng.random(n) < p_click

    rows: list[dict] = []
    next_click = 0

    def click_row(imp_row, delay_ms: int, prefix: str = "clk") -> dict:
        nonlocal next_click
        click_id = f"{prefix}-{next_click}"
        next_click += 1
        return {
            "click_id": click_id,
            "impression_id": imp_row.impression_id,
            "user_id": imp_row.user_id,
            "event_timestamp": int(imp_row.event_timestamp) + delay_ms,
        }

    for row in imp[clicked].itertuples():
        rows.append(click_row(row, int(rng.integers(500, 10_001))))

    # Edge cases (FIXTURES.md §2) on the first deterministic impressions:
    first = imp.iloc[0:8].itertuples()
    f = list(first)
    # multi-click impression: 3 distinct clicks on imp-0
    rows += [click_row(f[0], d, prefix="eclk") for d in (600, 700, 800)]
    # out-of-band click: 11 min after imp-1 (band is 10 min) -> must NOT count
    rows.append(click_row(f[1], 11 * 60 * 1000, prefix="eclk"))
    # boundary click: exactly at the band edge (10 min) -> counts (BETWEEN)
    rows.append(click_row(f[2], 10 * 60 * 1000, prefix="eclk"))
    # duplicate delivery: same click_id twice on imp-3 (at-least-once bus)
    dup = click_row(f[3], 900, prefix="eclk")
    rows.append(dup)
    rows.append(dict(dup))
    # out-of-order click on imp-4: timestamp before a later click but
    # delivered after (ordering only matters in streaming mode)
    rows.append(click_row(f[4], 501, prefix="eclk"))

    clk = pd.DataFrame(rows)
    # shuffle click delivery order deterministically (at-least-once,
    # unordered bus)
    clk = clk.sample(frac=1.0, random_state=seed).reset_index(drop=True)
    return AdFixture(impressions=imp, clicks=clk)


def write_parquet(fixture: AdFixture, directory: str) -> tuple[str, str]:
    import os

    os.makedirs(directory, exist_ok=True)
    imp_path = os.path.join(directory, "impressions.parquet")
    clk_path = os.path.join(directory, "clicks.parquet")
    fixture.impressions.to_parquet(imp_path, index=False)
    fixture.clicks.to_parquet(clk_path, index=False)
    return imp_path, clk_path
