"""Source tests: sacct line stitching (S2) and CSV reading (S3)."""

from __future__ import annotations

from slurm2sql_spark.sources.csv_source import (
    read_sacct_lines,
    stitch_lines,
)


def test_stitch_plain():
    lines = ["a;|;b;|;c", "d;|;e;|;f"]
    assert list(stitch_lines(lines, 3)) == [["a", "b", "c"], ["d", "e", "f"]]


def test_stitch_continuation():
    # A JobName containing a newline splits the record; the stitcher
    # rejoins with '\n' (reference slurm2sql.py:894-905).
    lines = ["1;|;my job", "part2;|;ok", "2;|;plain;|;x"]
    got = list(stitch_lines(lines, 3))
    assert got == [["1", "my job\npart2", "ok"], ["2", "plain", "x"]]


def test_stitch_too_many_fields():
    errors: list = []
    got = list(stitch_lines(["a;|;b;|;c;|;d", "x;|;y;|;z"], 3, errors))
    assert got == [["x", "y", "z"]]
    assert len(errors) == 1


def test_read_sacct_lines(spark):
    text = (
        "JobID;|;JobName;|;State\n"
        "1;|;hello;|;OK\n"
        "2;|;multi\n"
        "line name;|;OK\n"
    )
    df = read_sacct_lines(spark, text)
    rows = {r["JobID"]: r["JobName"] for r in df.collect()}
    assert rows == {"1": "hello", "2": "multi\nline name"}
