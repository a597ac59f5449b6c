"""GPU statistics embedded as JSON in the sacct Comment field.

Some sites configure jobstats collectors that stash per-job GPU
telemetry as a JSON object in Comment, e.g.
``{"gpu_mem_max": 12345, "ncpu": 2, "ngpu": 1, "gpu_util": 53.1}``.
The reference parses it with three ``linefunc``s kept OUT of the active
COLUMNS registry (reference slurm2sql.py:326-372; commented out at
653-656) — wired here as an opt-in projection with the same guards:
blank / 'No GPU stats' / 'abort' / non-JSON / non-object -> NULL.

Spark-side: one ``from_json`` per row (JVM Jackson, codegen-friendly),
shared across the three outputs by expression dedup in one projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["gpu_comment_struct", "with_gpu_comment_columns"]

_SCHEMA = "struct<gpu_mem_max: DOUBLE, gpu_util: DOUBLE, ngpu: BIGINT>"


def gpu_comment_struct(comment: Column) -> Column:
    """Parse the Comment JSON into a struct, NULL on every guard the
    reference checks (slurm2sql.py:326-372)."""
    trimmed = F.trim(comment)
    guarded = F.when(
        comment.isNull()
        | (trimmed == "")
        | comment.contains("No GPU stats")
        | (comment == "abort"),
        F.lit(None).cast("string"),
    ).otherwise(comment)
    # from_json yields NULL for malformed JSON; a JSON scalar (e.g. a
    # bare number) yields a struct of NULLs, matching the reference's
    # isinstance(dict) guard for the per-field reads.
    return F.from_json(guarded, _SCHEMA)


def with_gpu_comment_columns(df: DataFrame, comment_col: str = "Comment") -> DataFrame:
    """Opt-in R11 projection: add GPUMemComment / GPUEffComment /
    NGpusComment columns parsed from the Comment JSON (units matching
    the reference: bytes, 0-1 fraction, count)."""
    j = gpu_comment_struct(F.col(comment_col))
    return df.withColumns(
        {
            "GPUMemComment": j["gpu_mem_max"] * (2.0**20),
            "GPUEffComment": j["gpu_util"] / 100.0,
            "NGpusComment": j["ngpu"],
        }
    )
