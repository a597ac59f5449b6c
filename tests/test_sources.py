"""Source tests: sacct line stitching (S2) and CSV reading (S3)."""

from __future__ import annotations

import pytest

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


def test_dump_scan_matches_stitch_on_clean_dump(spark, tmp_path):
    """On a newline-free dump the distributed scan (default --sacct-dump
    path) and the driver-side stitcher must parse to IDENTICAL typed
    rows — same null mapping for empty fields, same column set."""
    from slurm2sql_spark import api

    text = (
        "JobID;|;JobIDRaw;|;User;|;State;|;NCPUS;|;Elapsed;|;ReqMem\n"
        "1;|;1;|;alice;|;COMPLETED;|;2;|;01:00:00;|;4G\n"
        "1.batch;|;1.batch;|;alice;|;COMPLETED;|;2;|;01:00:00;|;\n"
        "2;|;2;|;;|;RUNNING;|;;|;;|;\n"          # empty fields -> NULL
        "3_7;|;99;|;bob;|;FAILED;|;8;|;1-00:00:00;|;16Gn\n"
    )
    dump = tmp_path / "clean.txt"
    dump.write_text(text)
    errors_scan: list = []
    scan = api.ingest(
        spark, dump_path=str(dump), errors=errors_scan, now=1_700_000_000
    )
    errors_stitch: list = []
    stitch = api.ingest(
        spark, raw_lines=text, errors=errors_stitch, now=1_700_000_000
    )
    assert errors_scan == [] and errors_stitch == []
    assert scan.schema == stitch.schema
    a = sorted(map(tuple, scan.collect()))
    b = sorted(map(tuple, stitch.collect()))
    assert a == b and len(a) == 4


def test_sacct_dump_scan_reports_bad_lines(spark, tmp_path):
    from slurm2sql_spark.sources.csv_source import sacct_dump_scan

    dump = tmp_path / "bad.txt"
    dump.write_text(
        "A;|;B\n"
        "1;|;x\n"
        "short\n"
        "1;|;2;|;3\n"
    )
    ok, bad = sacct_dump_scan(spark, str(dump))
    assert sorted(map(tuple, ok.collect())) == [("1", "x")]
    badrows = {r.line: r.n_fields for r in bad.collect()}
    assert badrows == {"short": 1, "1;|;2;|;3": 3}


def test_sacct_dump_scan_empty_file(spark, tmp_path):
    import pytest

    from slurm2sql_spark.sources.csv_source import sacct_dump_scan

    p = tmp_path / "empty.txt"
    p.write_text("")
    with pytest.raises(ValueError, match="empty sacct dump"):
        sacct_dump_scan(spark, str(p))


def test_sacct_dump_scan_gzipped(spark, tmp_path):
    """sacct dumps are often stored gzipped; spark.read.text handles
    the codec transparently, so the scan path (and its error
    accounting) works on .gz files unchanged."""
    import gzip

    from slurm2sql_spark.sources.csv_source import sacct_dump_scan

    p = tmp_path / "dump.txt.gz"
    with gzip.open(p, "wt") as fh:
        fh.write("JobID;|;User\n1;|;alice\nbad-line\n2;|;bob\n")
    ok, bad = sacct_dump_scan(spark, str(p))
    assert sorted(map(tuple, ok.collect())) == [("1", "alice"), ("2", "bob")]
    assert bad.count() == 1


def _newline_dump_text(n_rows=400):
    """A dump exercising every stitch case: clean rows, 1- and 2-newline
    JobNames, empty fields, and one unrecoverable too-many-fields line."""
    out = ["JobID;|;JobName;|;State;|;NCPUS"]
    for i in range(n_rows):
        if i % 7 == 3:
            name = f"multi\nline-{i}"          # one embedded newline
        elif i % 13 == 5:
            name = f"very\nmulti\nline-{i}"    # two embedded newlines
        elif i % 11 == 6:
            name = ""                            # empty field -> NULL
        else:
            name = f"job{i}"
        state = "COMPLETED" if i % 2 else "RUNNING"
        out.append(f"{i};|;{name};|;{state};|;{i % 8}")
    out.append("bad;|;too;|;many;|;fields;|;here")  # unrecoverable
    return "\n".join(out) + "\n"


def _stitched_rows(df):
    # ""/NULL normalization: the distributed scans map empty -> NULL,
    # the driver kernel keeps ""; both mean "absent" downstream
    return sorted(
        tuple("" if v is None else v for v in r) for r in df.collect()
    )


@pytest.mark.parametrize("gz", [False, True], ids=["plain", "gzip"])
def test_dump_scan_stitched_matches_driver_kernel(spark, tmp_path, gz):
    """The distributed stitch must equal the driver stitcher on a
    MULTI-PARTITION dump (plain) and on a gzipped single-partition one
    — including records whose continuation lines cross a partition
    boundary, and the bad-line set."""
    from slurm2sql_spark.sources.csv_source import (
        sacct_dump_scan_stitched,
        stitch_lines,
    )

    text = _newline_dump_text()
    if gz:
        import gzip

        dump = tmp_path / "dump.txt.gz"
        dump.write_bytes(gzip.compress(text.encode()))
    else:
        dump = tmp_path / "dump.txt"
        dump.write_text(text)

    # force many small partitions so suspect runs cross boundaries
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
    try:
        ok, bad = sacct_dump_scan_stitched(spark, str(dump))
        if not gz:
            n_parts = ok.rdd.getNumPartitions()
            assert n_parts > 4, f"dump did not split ({n_parts} partitions)"
        got = _stitched_rows(ok)
        bad_got = sorted(r.line for r in bad.collect())
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)

    lines = text.splitlines()
    errors: list = []
    want = sorted(
        tuple(f) for f in stitch_lines(iter(lines[1:]), 4, errors)
    )
    assert got == want
    assert len(got) == 400  # every record recovered, exactly once
    assert bad_got == sorted(errors) and len(bad_got) == 1


def test_dump_scan_stitched_worst_cases(spark, tmp_path):
    """Adversarial shapes: a record split across MANY lines, a short
    fragment absorbed by exactly-completing continuation, a trailing
    unterminated buffer (dropped silently, reference behavior), and a
    repeated header line (data, matching the driver kernel)."""
    from slurm2sql_spark.sources.csv_source import (
        sacct_dump_scan_stitched,
        stitch_lines,
    )

    text = (
        "A;|;B;|;C\n"
        "1;|;x\ny\nz\nw;|;ok\n"       # 3 embedded newlines
        "A;|;B;|;C\n"                  # repeated header -> data row
        "2;|;fine;|;ok\n"
        "3;|;tail\nnever-completes\n"  # EOF buffer: dropped
    )
    dump = tmp_path / "worst.txt"
    dump.write_text(text)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "32")
    try:
        ok, bad = sacct_dump_scan_stitched(spark, str(dump))
        got = _stitched_rows(ok)
        n_bad = bad.count()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    errors: list = []
    want = sorted(
        tuple(f) for f in stitch_lines(iter(text.splitlines()[1:]), 3, errors)
    )
    assert got == want
    assert ("A", "B", "C") in got  # the repeated header parsed as data
    assert n_bad == len(errors) == 0


def test_api_ingest_dump_stitch_flag(spark, tmp_path):
    """api.ingest(dump_path=..., stitch=True) repairs newline-split
    records through the distributed stitched scan."""
    from slurm2sql_spark import api

    dump = tmp_path / "d.txt"
    dump.write_text(
        "JobID;|;JobName;|;User;|;State\n"
        "1;|;my\njob;|;alice;|;COMPLETED\n"
        "2;|;ok;|;bob;|;RUNNING\n"
    )
    errors: list = []
    typed = api.ingest(
        spark, dump_path=str(dump), stitch=True, errors=errors,
        now=1_700_000_000,
    )
    rows = {r.JobID: r.JobName for r in typed.select("JobID", "JobName").collect()}
    assert rows == {"1": "my\njob", "2": "ok"}
    assert errors == []


def test_dump_scan_stitched_rejects_directory(spark, tmp_path):
    """The stitch kernel chains file-adjacent runs, so a directory's
    arbitrary file ordering would silently merge unrelated records —
    must fail loudly like the replaced driver open() path did."""
    from slurm2sql_spark.sources.csv_source import sacct_dump_scan_stitched

    d = tmp_path / "dumps"
    d.mkdir()
    (d / "a.txt").write_text("JobID;|;User\n1;|;alice\n")
    with pytest.raises(ValueError, match="directory"):
        sacct_dump_scan_stitched(spark, str(d))


def test_dump_scan_stitched_rejects_glob(spark, tmp_path):
    """A glob pattern bypasses the isdir guard but still resolves to
    multiple files — the post-read inputFiles() assertion must catch
    it (ADVICE r6: the same silent-merge hazard as a directory)."""
    from slurm2sql_spark.sources.csv_source import sacct_dump_scan_stitched

    d = tmp_path / "dumps"
    d.mkdir()
    (d / "a.txt").write_text("JobID;|;User\n1;|;alice\n")
    (d / "b.txt").write_text("JobID;|;User\n2;|;bob\n")
    with pytest.raises(ValueError, match="resolved"):
        sacct_dump_scan_stitched(spark, str(d / "*.txt"))
