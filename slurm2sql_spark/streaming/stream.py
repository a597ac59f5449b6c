"""Structured Streaming surface — the reference is batch-only, but its
incremental protocol (SURVEY §2.12) maps onto exactly these shapes, so
the engine exposes them as first-class operators:

- ``stream_ingest``: watch a directory for sacct-shaped CSV drops and
  continuously append transformed rows to the parquet table. The
  ``availableNow`` trigger gives the reference's catch-up-then-stop
  batch semantics with streaming's exactly-once file tracking (the
  checkpoint replaces the hand-rolled watermark for this path).
- ``windowed_job_counts``: event-time tumbling-window aggregation with
  a lateness watermark — submit-rate monitoring over the stream.
- ``streaming_dedup``: drop duplicate JobIDs within the watermark
  horizon (the streaming analog of the keyed upsert).

All three are thin, testable plan builders: they return the streaming
DataFrame/query so callers pick sinks and triggers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from slurm2sql_spark.operators.transform import slurm_transform
from slurm2sql_spark.schema import RAW_FIELDS

__all__ = ["read_sacct_stream", "stream_ingest", "windowed_job_counts", "streaming_dedup"]


def read_sacct_stream(
    spark: SparkSession,
    input_dir: str,
    delimiter: str = ",",
    fields: tuple[str, ...] | None = None,
) -> DataFrame:
    """Streaming read of sacct-shaped CSV files landing in a directory.

    Schema must be declared up front for streams, and CSV columns bind
    by POSITION under a declared schema — so ``fields`` must list the
    columns the files actually contain, in file order (default: the
    full sacct request list). Everything is string; the typed
    projection is the transform's job, same as batch.
    """
    schema = T.StructType(
        [T.StructField(c, T.StringType(), True) for c in (fields or RAW_FIELDS)]
    )
    return (
        spark.readStream.schema(schema)
        .option("header", True)
        .option("sep", delimiter)
        .option("maxFilesPerTrigger", 16)
        .csv(input_dir)
    )


def stream_ingest(
    spark: SparkSession,
    input_dir: str,
    table_path: str,
    checkpoint_dir: str,
    now: int | None = None,
    available_now: bool = True,
    fields: tuple[str, ...] | None = None,
):
    """File-drop -> transform -> parquet append, exactly-once via the
    checkpoint's file log. Returns the started StreamingQuery.

    Append mode means replayed *files* are deduped by the checkpoint but
    replayed *keys* are not — run ``parquet_sink.upsert``-style
    compaction or ``streaming_dedup`` upstream when JobIDs can repeat
    across files.
    """
    raw = read_sacct_stream(spark, input_dir, fields=fields)
    typed = slurm_transform(raw, now=now)
    writer = (
        typed.writeStream.format("parquet")
        .option("path", table_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_job_counts(
    typed_stream: DataFrame,
    window: str = "1 hour",
    lateness: str = "1 day",
) -> DataFrame:
    """Tumbling event-time window over Submit with a lateness watermark:
    jobs submitted per (window, Partition). State for windows older than
    the watermark is dropped — bounded memory on an unbounded stream."""
    with_ts = typed_stream.withColumn(
        "submit_ts", F.to_timestamp(F.from_unixtime(F.col("Submit")))
    )
    return (
        with_ts.withWatermark("submit_ts", lateness)
        .groupBy(F.window("submit_ts", window).alias("w"), F.col("Partition"))
        .agg(
            F.count(F.lit(1)).alias("n_jobs"),
            F.sum("NCPUS").alias("cpus_requested"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "Partition",
            "n_jobs",
            "cpus_requested",
        )
    )


def streaming_dedup(
    typed_stream: DataFrame, lateness: str = "1 day"
) -> DataFrame:
    """Drop repeated JobIDs within the watermark horizon — the streaming
    analog of the reference's INSERT OR REPLACE key (first-wins here;
    use the batch upsert for last-wins semantics)."""
    with_ts = typed_stream.withColumn(
        "submit_ts", F.to_timestamp(F.from_unixtime(F.col("Submit")))
    )
    return with_ts.withWatermark("submit_ts", lateness).dropDuplicatesWithinWatermark(
        ["JobID"]
    )
