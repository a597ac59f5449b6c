"""Schema-robustness guards for driver-generated testdata.

The driver regenerates /root/testdata between rounds and has already
shipped events.ts as BOTH parquet TIMESTAMP(NANOS) and timestamp[us]
(round 4 broke on exactly that flip: catalog assumed nanos-as-long and
every events query failed analysis). These tests pin the contract:

1. Every catalog query must ANALYZE (schema resolution — the phase that
   failed in round 4) against the real testdata, whatever dtypes the
   driver chose this round. Analysis-only keeps this cheap (~no jobs).
2. The three events queries must produce IDENTICAL results across all
   three plausible physical encodings of `ts` — timestamp[us] naive
   (Spark TIMESTAMP_NTZ), timestamp[us] UTC-adjusted (Spark TIMESTAMP
   LTZ), and TIMESTAMP(NANOS) (Spark bigint under nanosAsLong) — so a
   future testdata regeneration cannot silently change semantics. Note
   the test session runs TZ=Europe/Helsinki, so equality across the NTZ
   and LTZ variants also proves _ts_us() is session-TZ-independent.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from slurm2sql_spark.catalog import QUERIES

SF_DIR = "/root/testdata/sf0.001"

EVENTS_QUERIES = ["latest_event_per_user", "sessionize", "windowed_event_counts"]


needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@needs_testdata
def test_every_catalog_query_analyzes_on_real_testdata(spark):
    # .schema forces full analysis (column resolution + type checking —
    # where round 4's DATATYPE_MISMATCH surfaced) without running a job.
    for name, spec in QUERIES.items():
        try:
            _ = spec.spark(spark, SF_DIR).schema
        except Exception as exc:  # pragma: no cover - failure reporting
            pytest.fail(f"catalog query {name!r} failed analysis: {exc}")


def _write_ts_variant(src_table: pa.Table, out_dir: str, variant: str) -> str:
    """Rewrite events with `ts` re-encoded; returns the sf_dir to read."""
    idx = src_table.schema.get_field_index("ts")
    ts = src_table.column("ts").cast(pa.timestamp("us"))
    if variant == "us_naive":
        new = ts
    elif variant == "us_utc":
        new = ts.cast(pa.timestamp("us", tz="UTC"))
    elif variant == "nanos":
        new = ts.cast(pa.timestamp("ns"))
    else:  # pragma: no cover
        raise AssertionError(variant)
    table = src_table.set_column(idx, pa.field("ts", new.type), new)
    os.makedirs(out_dir, exist_ok=True)
    # store_schema=False drops the Arrow schema sidecar so readers see
    # only the parquet logical type — what the driver's files look like.
    pq.write_table(
        table,
        f"{out_dir}/events.parquet",
        coerce_timestamps=None,
        store_schema=False,
    )
    return out_dir


@needs_testdata
@pytest.mark.parametrize("qname", EVENTS_QUERIES)
def test_events_queries_identical_across_ts_encodings(spark, tmp_path, qname):
    src = pq.read_table(f"{SF_DIR}/events.parquet")
    results = {}
    for variant in ("us_naive", "us_utc", "nanos"):
        sf_dir = _write_ts_variant(src, str(tmp_path / variant), variant)
        df = QUERIES[qname].spark(spark, sf_dir)
        rows = sorted(tuple(r) for r in df.collect())
        results[variant] = (tuple(sorted(df.columns)), rows)
    assert results["us_naive"] == results["us_utc"], (
        f"{qname}: NTZ vs LTZ encodings disagree"
    )
    assert results["us_naive"] == results["nanos"], (
        f"{qname}: micros vs nanos encodings disagree"
    )
