"""State-store configuration: the analogue of the reference's RocksDB
state backend + checkpointing (`docker-compose.yml:74-79,96-100`).

Structured Streaming state (join buffers, window accumulators, dedup
sets, applyInPandasWithState state) lives in a pluggable state store.
The default HDFSBackedStateStoreProvider keeps state on the executor
heap -- fine for small keyspaces, fatal for 100 TB-scale retention.
``use_rocksdb`` switches to the RocksDB provider (bundled with Spark
since 3.2): state spills to local disk with changelog checkpointing to
the checkpoint location, bounding executor memory by working set, not
keyspace -- the same operational posture as Flink-on-RocksDB.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def use_rocksdb(spark: SparkSession, *, changelog_checkpointing: bool = True) -> None:
    """Route streaming state to RocksDB for queries started after this
    call (the provider is read at query start)."""
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true" if changelog_checkpointing else "false",
    )


def use_default_store(spark: SparkSession) -> None:
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
