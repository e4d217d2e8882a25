#!/usr/bin/env python3
"""Scratch: near-dup gate small-trigger throughput across
{hdfs,rocksdb} x {32,8,4 shuffle partitions}."""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
import numpy as np
from pyspark.sql import functions as F

from bench_scale import make_corpus
from flink_ad_analytics_spark.session import build_session
from flink_ad_analytics_spark.streaming.jobs import streaming_ingest_neardup
from flink_ad_analytics_spark.streaming.state import use_rocksdb, use_default_store

spark = build_session(app_name="nd-dial", cpus=32, shuffle_partitions=32,
                      extra_conf={"spark.ui.enabled": "false"})
spark.sparkContext.setLogLevel("ERROR")

tmp = tempfile.mkdtemp(prefix="nd_dial_")
n_docs = 25_000
corpus, _ = make_corpus(n_docs)
corpus = corpus.reset_index(drop=True)
corpus["event_time_ms"] = 1_704_067_200_000 + np.arange(len(corpus)) * 40
nd_dir = f"{tmp}/nd"
os.makedirs(nd_dir)
for i in range(8):
    corpus.iloc[i * len(corpus) // 8:(i + 1) * len(corpus) // 8].to_parquet(
        f"{nd_dir}/part-{i}.parquet", index=False)
schema = spark.read.parquet(nd_dir).schema

results = {}
for store in ["hdfs", "rocksdb"]:
    if store == "rocksdb":
        use_rocksdb(spark)
    else:
        use_default_store(spark)
    for sp in [32, 8, 4]:
        spark.conf.set("spark.sql.shuffle.partitions", str(sp))
        tag = f"{store}_{sp}"
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(nd_dir)
            .withColumn("event_time", F.timestamp_millis(F.col("event_time_ms")))
        )
        verdicts = streaming_ingest_neardup(
            stream, watermark="10 seconds", shuffle_docs=32)
        t0 = time.perf_counter()
        q = (verdicts.writeStream.format("memory").queryName(f"nd_{tag}")
             .outputMode("append")
             .option("checkpointLocation", f"{tmp}/ckpt_{tag}").start())
        q.processAllAvailable()
        el = time.perf_counter() - t0
        q.stop()
        kept = spark.table(f"nd_{tag}").filter("kept").count()
        total = spark.table(f"nd_{tag}").count()
        results[tag] = (round(len(corpus) / el, 1), round(el, 2), kept, total)
        print("RES", tag, results[tag], flush=True)

shutil.rmtree(tmp, ignore_errors=True)
