"""Structured Streaming ingestion mode (SURVEY.md §2.11).

The reference is a pull-based streaming *library* (``Source``,
`api/src/source.rs:72`) without temporal semantics, so batch Spark is
semantically sufficient; this module provides the optional incremental
mode the north star describes: a file-source stream over the pages
table (``warc_ts`` as event time), the same extract logic per
micro-batch via ``foreachBatch``, watermarked windowed page-rate
metrics, and append-only quad output.

The extract logic is IDENTICAL code to the batch path (extract_quads) —
one definition, two execution modes.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.extract import PAGES_SCHEMA, extract_quads, split_quarantine


def read_pages_stream(
    spark: SparkSession,
    path: str,
    *,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """File-source stream over a parquet pages directory."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_extract(
    pages_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    *,
    quarantine_dir: Optional[str] = None,
):
    """pages stream → per-micro-batch extract → append parquet.

    ``foreachBatch`` reuses the exact batch extract; checkpointing gives
    exactly-once file output + resume (the streaming face of the
    checkpoint-resumable requirement).
    """

    def process(batch_df: DataFrame, batch_id: int):
        good, bad = split_quarantine(extract_quads(batch_df, from_html=True))
        good.write.mode("append").parquet(out_dir)
        if quarantine_dir is not None:
            bad.write.mode("append").parquet(quarantine_dir)

    return (
        pages_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def streaming_sessionize(
    events_stream: DataFrame, gap_seconds: int = 1800
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState`` (the
    engine's `applyInPandasWithState` surface from the driver brief):
    gap-based sessionization per user with state carried across
    micro-batches.

    State per user: (n_sessions, last_ts_epoch, cur_events, max_events).
    Rows are processed in (ts, event_id) order within each batch; the
    batch twin (`__spark_entry__._q_events_sessionize`) is the oracle
    when the whole input arrives in one batch.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    out_type = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_sessions", LongType()),
            StructField("max_session_events", LongType()),
        ]
    )
    state_type = StructType(
        [
            StructField("n_sessions", LongType()),
            StructField("last_ts", LongType()),
            StructField("cur_events", LongType()),
            StructField("max_events", LongType()),
        ]
    )

    def update(key, pdfs, state: "GroupState"):
        if state.exists:
            n_sessions, last_ts, cur_events, max_events = state.get
        else:
            n_sessions, last_ts, cur_events, max_events = 0, None, 0, 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        for ts in rows["ts"]:
            epoch = int(ts.timestamp())
            if last_ts is None or epoch - last_ts > gap_seconds:
                n_sessions += 1
                cur_events = 0
            cur_events += 1
            max_events = max(max_events, cur_events)
            last_ts = epoch
        state.update((n_sessions, last_ts, cur_events, max_events))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [n_sessions],
                "max_session_events": [max_events],
            }
        )

    return (
        events_stream.select("user_id", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_type, state_type, "update", GroupStateTimeout.NoTimeout
        )
    )


def page_rate_metrics(pages_stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling-window ingest metrics (pages + bytes per
    5-minute event-time window); late pages beyond the watermark drop."""
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", "5 minutes").alias("w"), F.col("lang"))
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.length("html")).alias("html_bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
            "html_bytes",
        )
    )
