"""Structured Streaming ingestion tests: file-source stream → per-batch
extract → append output, exactly-once via checkpoint, resume behavior."""

import os

import pytest
from pyspark.sql import functions as F

from sophia_rs_spark.plans.extract import pages_df
from sophia_rs_spark.sources.fixtures import fixture_pages, tiled_pages
from sophia_rs_spark.streaming.ingest import (
    page_rate_metrics,
    read_pages_stream,
    streaming_extract,
)


@pytest.fixture()
def pages_dir(spark, tmp_path):
    p = str(tmp_path / "pages")
    pages = pages_df(spark, tiled_pages(40)).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    pages.repartition(4).write.parquet(p)
    return p


def test_streaming_extract_matches_batch(spark, pages_dir, tmp_path):
    out = str(tmp_path / "quads")
    chk = str(tmp_path / "chk")
    stream = read_pages_stream(spark, pages_dir, max_files_per_trigger=2)
    q = streaming_extract(stream, out, chk).start()
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    from sophia_rs_spark.plans.extract import extract_quads, split_quarantine

    batch_good, _ = split_quarantine(
        extract_quads(spark.read.parquet(pages_dir), from_html=True)
    )
    a = sorted(tuple(r) for r in got.select("s", "p", "o").collect())
    b = sorted(tuple(r) for r in batch_good.select("s", "p", "o").collect())
    assert a == b and len(a) > 0


def test_streaming_resume_no_duplicates(spark, pages_dir, tmp_path):
    out = str(tmp_path / "quads")
    chk = str(tmp_path / "chk")
    stream = read_pages_stream(spark, pages_dir, max_files_per_trigger=2)
    q = streaming_extract(stream, out, chk).start()
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    # restart with the same checkpoint: no new input → no new rows
    q2 = streaming_extract(
        read_pages_stream(spark, pages_dir, max_files_per_trigger=2), out, chk
    ).start()
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == n1


def test_page_rate_metrics_schema(spark, pages_dir):
    stream = read_pages_stream(spark, pages_dir)
    m = page_rate_metrics(stream)
    assert set(m.columns) == {
        "window_start",
        "window_end",
        "lang",
        "n_pages",
        "html_bytes",
    }
    assert m.isStreaming


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization over a single availableNow
    batch equals the batch window-function twin."""
    import __spark_entry__ as e
    from sophia_rs_spark.streaming.ingest import streaming_sessionize

    src = "/root/testdata/sf0.001/events.parquet"
    events = spark.read.parquet(src)
    expected = {
        (r["user_id"], r["n_sessions"], r["max_session_events"])
        for r in e.queries()["events_sessionize"](spark, "/root/testdata/sf0.001").collect()
    }

    events.coalesce(1).write.parquet(str(tmp_path / "events_in"), mode="overwrite")
    stream = (
        spark.readStream.schema(events.schema).parquet(
            str(tmp_path / "events_in")
        )
    )
    out = streaming_sessionize(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got_df = spark.sql(
        "SELECT user_id, n_sessions, max_session_events FROM sess_out"
    )
    # last update per user (single batch → exactly one row per user)
    got = {
        (r["user_id"], r["n_sessions"], r["max_session_events"])
        for r in got_df.collect()
    }
    assert got == expected


def test_watermark_drops_late_pages(spark, tmp_path):
    """Late-data semantics end-to-end: a page older than the watermark,
    arriving in a later micro-batch, must NOT reopen its (already
    finalized, append-emitted) window."""
    import datetime as dt
    import time

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    p = str(tmp_path / "pages_late")
    os.makedirs(p)

    def mk(rows):
        return spark.createDataFrame(
            [
                (f"http://x/{i}", ts, bytearray(b"<html></html>"), "", "en")
                for i, ts in enumerate(rows)
            ],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )

    # batch A: five pages in [10:00,10:05) + one at 10:30 that pushes the
    # watermark (10m) to 10:20, past the first window's end
    mk([base + dt.timedelta(minutes=m) for m in (0, 1, 2, 3, 4)]
       + [base + dt.timedelta(minutes=30)]).coalesce(1).write.mode("append").parquet(p)
    time.sleep(1.1)  # file-source orders batches by mod time
    # batch B: a current page — the advanced watermark takes effect
    # (Spark applies a new watermark starting with the NEXT batch)
    mk([base + dt.timedelta(minutes=31)]).coalesce(1).write.mode("append").parquet(p)
    time.sleep(1.1)
    # batch C: one LATE page at 10:01 — beyond the watermark, must drop
    mk([base + dt.timedelta(minutes=1)]).coalesce(1).write.mode("append").parquet(p)

    stream = (
        spark.readStream.schema(
            "url string, warc_ts timestamp, html binary, text string, lang string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(p)
    )
    metrics = page_rate_metrics(stream, watermark="10 minutes")
    q = (
        metrics.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"].isoformat(), r["n_pages"])
        for r in spark.sql("select * from late_test").collect()
    }
    # the 10:00-10:05 window closed with 5 pages; the late 10:01 page was
    # dropped (6 would mean the watermark failed to finalize the window)
    assert ("2024-01-01T10:00:00", 5) in got
    assert ("2024-01-01T10:00:00", 6) not in got
    assert ("2024-01-01T10:00:00", 1) not in got
