"""`ad_events`: the reference's event generator as a first-class Spark
data source (batch + streaming), via the Spark 4 Python DataSource API.

The reference produces its workload with a single-process Kafka
producer (`/root/reference/data-generator/generate_events.py`): 50
impressions/s, campaigns camp-1..10, ads 1..100, cost
uniform(0.01, 0.50), clicks with probability
min(0.6, 0.1 * phase_boost) and delay uniform 500..10000 ms, and the
camp-1 DROP/SPIKE anomaly schedule (generate_events.py:108-121) --
plus this repo's OWN fixture extension of ~5% NULL device_type rows
(FIXTURES.md edge-case trap; the reference generator never emits
nulls, fixtures.py added them so null-handling is always exercised).
This module re-expresses that generator as a REGISTERED SOURCE, so
the jobs that would read Kafka in production (`streaming/sources.py`)
can be driven end-to-end in-process -- `spark.read.format("ad_events")`
or `spark.readStream.format("ad_events")` -- with no broker.

Design for scale (the point of making it a DataSource rather than a
driver-side fixture):

* Event i is a pure function of (seed, i): all randomness comes from a
  vectorized splitmix64-style integer mix, not a sequential RNG. Any
  partition can generate its slice independently -- 1000 executors can
  synthesize a 100 TB workload with zero coordination, and batch,
  streaming, and re-reads all agree bit-for-bit.
* Batch: `partitions()` splits [0, n_events) into `num_partitions`
  ranges; each task materializes its range with numpy and yields rows.
* Streaming: a full `DataSourceStreamReader` (not the Simple driver-
  side variant): offsets are event indices bounded by `max_events`,
  and `partitions()` re-splits every batch range so generation stays
  distributed. Progression across micro-batches comes from the
  CHECKPOINT (run AvailableNow passes with growing `max_events`); the
  reader itself is stateless, because python reader instances are not
  guaranteed to survive between batches.
* Clicks derive from their impression by index: impression i clicks
  iff u01(i, "click") < p(i), with delay u01(i, "delay") -- so the
  click stream is independently generatable AND referentially
  consistent with the impression stream (every click_id joins back).

Options: kind=impressions|clicks (default impressions),
seed, duration_sec (batch span; n = 50 * duration_sec),
max_events (streaming high-watermark), num_partitions.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..fixtures import (
    ANOMALY_PHASES,
    BROWSERS,
    CLICK_RATIO,
    DEVICES,
    EVENT_RATE,
    MAX_CTR_CAP,
    VIRTUAL_START_MS,
)

_STEP_MS = 1000 // EVENT_RATE

IMPRESSIONS_SCHEMA = StructType(
    [
        StructField("impression_id", StringType(), False),
        StructField("user_id", StringType(), False),
        StructField("campaign_id", StringType(), False),
        StructField("ad_id", StringType(), False),
        StructField("device_type", StringType(), True),
        StructField("browser", StringType(), False),
        StructField("event_timestamp", LongType(), False),
        StructField("cost", DoubleType(), False),
    ]
)

CLICKS_SCHEMA = StructType(
    [
        StructField("click_id", StringType(), False),
        StructField("impression_id", StringType(), False),
        StructField("user_id", StringType(), False),
        StructField("event_timestamp", LongType(), False),
    ]
)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer: uint64 -> well-mixed uint64, vectorized."""
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def _channel(idx: np.ndarray, seed: int, salt: int) -> np.ndarray:
    """Independent hash channel over event indices (uint64)."""
    base = np.uint64(
        (seed * 0x632BE59BD9B4E019 + salt * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    )
    with np.errstate(over="ignore"):
        return _mix64(idx.astype(np.uint64) + base)


def _u01(idx: np.ndarray, seed: int, salt: int) -> np.ndarray:
    """Uniform [0,1) per index, 53-bit mantissa."""
    return (_channel(idx, seed, salt) >> np.uint64(11)) / float(1 << 53)


def _phase_boost_vec(camp_no: np.ndarray, t_sec: np.ndarray) -> np.ndarray:
    """fixtures.ANOMALY_PHASES (the single source of truth for the
    camp-1 DROP/SPIKE schedule), vectorized."""
    boost = np.ones_like(t_sec)
    c1 = camp_no == 1
    prev_end = 0.0
    for end, b in ANOMALY_PHASES:
        if b != 1.0:
            boost = np.where(c1 & (t_sec >= prev_end) & (t_sec < end), b, boost)
        prev_end = end
    return boost


def _gen_impressions(start: int, end: int, seed: int) -> dict[str, np.ndarray]:
    i = np.arange(start, end, dtype=np.int64)
    camp_no = 1 + (_channel(i, seed, 1) % np.uint64(10)).astype(np.int64)
    ad_no = 1 + (_channel(i, seed, 2) % np.uint64(100)).astype(np.int64)
    user_no = 1 + (_channel(i, seed, 3) % np.uint64(10_000)).astype(np.int64)
    dev_no = (_channel(i, seed, 4) % np.uint64(3)).astype(np.int64)
    dev_null = _u01(i, seed, 5) < 0.05
    brw_no = (_channel(i, seed, 6) % np.uint64(4)).astype(np.int64)
    cost = np.round(0.01 + _u01(i, seed, 7) * 0.49, 2)
    return {
        "i": i,
        "camp_no": camp_no,
        "ad_no": ad_no,
        "user_no": user_no,
        "dev_no": dev_no,
        "dev_null": dev_null,
        "brw_no": brw_no,
        "ts": VIRTUAL_START_MS + i * _STEP_MS,
        "cost": cost,
    }


def _prefixed(prefix: str, nums: np.ndarray) -> "object":
    """Vectorized '<prefix>-<n>' string column as a pyarrow array."""
    import pyarrow as pa
    import pyarrow.compute as pc

    return pc.binary_join_element_wise(
        prefix, pc.cast(pa.array(nums), pa.string()), "-"
    )


def _iter_impressions(start: int, end: int, seed: int):
    """Yield ONE pyarrow RecordBatch for the range: the DataSource API
    accepts arrow batches, which keeps generation fully vectorized --
    no per-row Python loop, no per-field scalar extraction. This is
    the path that lets 1000 executors synthesize 100 TB: per-task cost
    is a handful of numpy/arrow kernel calls over the whole slice."""
    import pyarrow as pa

    g = _gen_impressions(start, end, seed)
    if len(g["i"]) == 0:
        return
    devices = pa.array(
        [None if n else DEVICES[d] for n, d in zip(g["dev_null"].tolist(), g["dev_no"].tolist())],
        pa.string(),
    )
    browsers = pa.array([BROWSERS[b] for b in g["brw_no"].tolist()], pa.string())
    yield pa.RecordBatch.from_arrays(
        [
            _prefixed("imp", g["i"]),
            _prefixed("user", g["user_no"]),
            _prefixed("camp", g["camp_no"]),
            _prefixed("ad", g["ad_no"]),
            devices,
            browsers,
            pa.array(g["ts"], pa.int64()),
            pa.array(g["cost"], pa.float64()),
        ],
        names=[f.name for f in IMPRESSIONS_SCHEMA.fields],
    )


def _iter_clicks(start: int, end: int, seed: int):
    import pyarrow as pa

    g = _gen_impressions(start, end, seed)
    i = g["i"]
    t_sec = (i * _STEP_MS) / 1000.0
    boost = _phase_boost_vec(g["camp_no"], t_sec)
    p_click = np.minimum(MAX_CTR_CAP, CLICK_RATIO * boost)
    clicked = _u01(i, seed, 8) < p_click
    delay = (500 + _u01(i, seed, 9) * 9500).astype(np.int64)
    sel = np.flatnonzero(clicked)
    if len(sel) == 0:
        return
    yield pa.RecordBatch.from_arrays(
        [
            _prefixed("clk", i[sel]),
            _prefixed("imp", i[sel]),
            _prefixed("user", g["user_no"][sel]),
            pa.array(g["ts"][sel] + delay[sel], pa.int64()),
        ],
        names=[f.name for f in CLICKS_SCHEMA.fields],
    )


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


def _split(start: int, end: int, parts: int) -> list[_Range]:
    n = max(1, end - start)
    parts = max(1, min(parts, n))
    bounds = np.linspace(start, end, parts + 1, dtype=np.int64)
    return [
        _Range(int(a), int(b))
        for a, b in zip(bounds[:-1], bounds[1:])
        if b > a
    ]


class _Opts:
    def __init__(self, options: dict):
        self.kind = options.get("kind", "impressions")
        if self.kind not in ("impressions", "clicks"):
            raise ValueError(f"ad_events: unknown kind {self.kind!r}")
        self.seed = int(options.get("seed", 42))
        self.duration_sec = int(options.get("duration_sec", 60))
        self.n_events = self.duration_sec * EVENT_RATE
        self.max_events = int(options.get("max_events", self.n_events))
        self.num_partitions = int(options.get("num_partitions", 8))

    def iter_range(self, start: int, end: int):
        it = _iter_impressions if self.kind == "impressions" else _iter_clicks
        return it(start, end, self.seed)


class AdEventsBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.o = _Opts(options)

    def partitions(self):
        return _split(0, self.o.n_events, self.o.num_partitions)

    def read(self, partition: _Range):
        return self.o.iter_range(partition.start, partition.end)


class AdEventsStreamReader(DataSourceStreamReader):
    """Micro-batch offsets are impression indices: each batch covers
    (start, min(start + rows_per_batch, max_events)) and is re-split
    across partitions, so a streaming backfill generates in parallel
    exactly like batch. `max_events` bounds latestOffset, which makes
    Trigger.AvailableNow drain the source to a deterministic end --
    the broker-less analogue of reading a topic to its high watermark.
    """

    def __init__(self, options: dict):
        self.o = _Opts(options)

    def initialOffset(self):
        return {"idx": 0}

    def latestOffset(self):
        # The reader is intentionally STATELESS (python reader
        # instances are not guaranteed to live across micro-batches):
        # latestOffset always reports max_events, and progression
        # comes from the CHECKPOINT -- run Trigger.AvailableNow with a
        # growing max_events per pass and each restart resumes from
        # the committed offset, processing only the new range. That is
        # exactly the incremental-backfill pattern a bounded Kafka
        # topic read follows.
        return {"idx": self.o.max_events}

    def partitions(self, start: dict, end: dict):
        if end["idx"] < start["idx"]:
            # A shrunken max_events would silently regress the offset
            # (empty batch commits the SMALLER offset; a later pass
            # would then re-emit rows the sink already has). Refuse.
            raise ValueError(
                f"ad_events: max_events={end['idx']} is behind the "
                f"committed offset {start['idx']}; offsets must not regress"
            )
        return _split(start["idx"], end["idx"], self.o.num_partitions)

    def read(self, partition: _Range):
        return self.o.iter_range(partition.start, partition.end)

    def commit(self, end: dict) -> None:
        pass


class AdEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ad_events"

    def schema(self):
        kind = self.options.get("kind", "impressions")
        return IMPRESSIONS_SCHEMA if kind == "impressions" else CLICKS_SCHEMA

    def reader(self, schema) -> AdEventsBatchReader:
        return AdEventsBatchReader(self.options)

    def streamReader(self, schema) -> AdEventsStreamReader:
        return AdEventsStreamReader(self.options)


def register_ad_events(spark) -> None:
    """Idempotent registration: after this,
    ``spark.read.format('ad_events')`` / ``readStream`` work."""
    spark.dataSource.register(AdEventsDataSource)
