"""CLI frontends (sacct/seff/ingest) + library API, pinned against the
reference's CLI behavior (reference test.py:235-281: sacct prints
JobID/User columns; seff prints percentage efficiencies)."""

from __future__ import annotations

import pytest

from slurm2sql_spark import api
from slurm2sql_spark.cli import format_table, ingest_cli, sacct_cli, seff_cli

# TRES values contain commas, so those CSV fields are double-quoted.
CSV = """JobID,JobIDRaw,User,State,Elapsed,CPUTime,TotalCPU,TRESUsageInTot,AllocTRES,Start,End,NCPUS,Partition
1,1,alice,COMPLETED,01:00:00,02:00:00,,,"cpu=2,mem=4G",2021-01-01T10:00:00,2021-01-01T11:00:00,2,cpu
1.batch,1.batch,alice,COMPLETED,01:00:00,02:00:00,01:00:00,"cpu=01:00:00,mem=2G","cpu=2,mem=4G",2021-01-01T10:00:00,2021-01-01T11:00:00,2,cpu
2,2,bob,RUNNING,00:30:00,01:00:00,,,"cpu=2,mem=1G",2021-01-01T12:00:00,,2,gpu
"""


@pytest.fixture()
def csv_path(tmp_path):
    p = tmp_path / "jobs.csv"
    p.write_text(CSV)
    return str(p)


def test_api_ingest_csv(spark, csv_path):
    df = api.ingest_csv(spark, csv_path, now=1_700_000_000)
    by_id = {r.JobID: r for r in df.collect()}
    assert by_id["1"].NCPUS == 2
    assert by_id["1"].AllocMem == 4 * 1024**3
    assert by_id["1.batch"].JobStep == "batch"
    assert by_id["2"].End is None


def test_api_ingest_persist_roundtrip(spark, csv_path, tmp_path):
    table = str(tmp_path / "tbl")
    df = api.ingest_csv(spark, csv_path, table_path=table)
    assert df.count() == 3
    assert api.open_table(spark, table).count() == 3


def test_sacct_cli_default_fields(spark, csv_path):
    out = sacct_cli(spark, ["--csv-input", csv_path])
    assert "JobID" in out and "User" in out
    assert "alice" in out and "bob" in out
    assert "┃" in out  # the visual separator columns survive


def test_sacct_cli_custom_output_and_filters(spark, csv_path):
    out = sacct_cli(
        spark,
        ["--csv-input", csv_path, "-o", "JobID,User,NCPUS", "--user", "alice",
         "--order", "JobID"],
    )
    lines = out.splitlines()
    assert lines[0].split() == ["JobID", "User", "NCPUS"]
    assert "bob" not in out
    assert len(lines) == 2 + 2  # header + rule + 2 alice rows


def test_seff_cli_per_job(spark, csv_path):
    out = seff_cli(spark, ["--csv-input", csv_path])
    # only job 1 has Start and End; CPUeff 1h used / 2h reserved = 50%
    assert "alice" in out and "bob" not in out
    assert " 50%" in out
    assert "hours" in out
    assert "1" in out.splitlines()[2]


def test_seff_cli_aggregate_user(spark, csv_path):
    out = seff_cli(spark, ["--csv-input", csv_path, "--aggregate-user"])
    assert "alice" in out
    assert "cpu_day" in out


def test_seff_cli_no_data_exit_2(spark, tmp_path):
    p = tmp_path / "empty.csv"
    p.write_text("JobID,JobIDRaw,User,State,Start,End\n")
    with pytest.raises(SystemExit) as e:
        seff_cli(spark, ["--csv-input", str(p)])
    assert e.value.code == 2


def test_ingest_cli(spark, csv_path, tmp_path):
    table = str(tmp_path / "t2")
    msg = ingest_cli(spark, [table, "--csv-input", csv_path])
    assert "3 rows" in msg
    msg2 = ingest_cli(spark, [table, "--csv-input", csv_path, "--update"])
    assert "3 rows" in msg2  # idempotent upsert


def test_format_table_alignment(spark):
    df = spark.createDataFrame([("a", 1), ("bb", 22)], "s string, n long")
    out = format_table(df.orderBy("n")).splitlines()
    assert out[0].startswith("s")
    assert set(out[1]) <= {"-", " "}
    assert out[2].startswith("a")
    assert out[3].endswith("22")
