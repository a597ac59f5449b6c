"""Seeded-fuzz grammar tests: generate thousands of random sacct-format
strings, parse them all in ONE Spark job, and compare each result to an
independent pure-Python model of the reference's semantics
(slurm2sql.py:84-164, 412-462). Complements the example-based tests
with coverage of the grammar's corners (the reference's own suite is
example-based, SURVEY §5)."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F


def _py_slurmtime(s: str):
    """Reference slurmtime model (slurm2sql.py:84-107)."""
    if not s or s in ("UNLIMITED", "Partition_Limit"):
        return None
    try:
        if "-" in s:
            d, rest = s.split("-", 1)
            parts = (rest.split(":") + ["0", "0", "0"])[:3]
            return (
                float(d) * 86400
                + float(parts[0] or 0) * 3600
                + float(parts[1] or 0) * 60
                + float(parts[2] or 0)
            )
        parts = s.split(":")
        if len(parts) == 1:
            return float(s) * 60  # bare number = minutes
        parts = ["0"] * (3 - len(parts)) + parts
        return float(parts[-3]) * 3600 + float(parts[-2]) * 60 + float(parts[-1])
    except ValueError:
        return None


def _py_slurmmem(s: str):
    """Reference slurmmem model: strip n/c suffix then float_bytes —
    binary units, bare numbers pass through unscaled
    (slurm2sql.py:122-147)."""
    if not s:
        return None
    s = s.strip("nc")
    scale = {"K": 1, "M": 2, "G": 3, "T": 4, "P": 5}
    try:
        if s and s[-1].upper() in scale:
            return float(s[:-1]) * 1024.0 ** scale[s[-1].upper()]
        return float(s)
    except ValueError:
        return None


def _py_jobid_parts(s: str):
    r"""Reference JobID grammar model (slurm2sql.py:410-462):
    nostep = leading match of [0-9]+(_[0-9]+)? (stops at '+', '_[');
    step = text after the LAST '.'; only = leading [0-9]+;
    atask = first _(\d+) unless the id contains '['."""
    import re

    if not s:
        return (None, None, None, None)
    nostep = re.match(r"[0-9]+(_[0-9]+)?", s).group(0)
    step = s.split(".")[-1] if "." in s else None
    only = re.match(r"[0-9]+", s).group(0)
    atask = None
    if "_" in s and "[" not in s:
        atask = int(re.search(r"_([0-9]+)", s).group(1))
    return (nostep, step, only, atask)


@pytest.fixture(scope="module")
def rng():
    return random.Random(0x5EED)


def test_fuzz_slurmtime(spark, rng):
    vals = []
    for _ in range(2000):
        form = rng.randrange(6)
        if form == 0:
            vals.append(f"{rng.randrange(100)}-{rng.randrange(24):02d}")
        elif form == 1:
            vals.append(
                f"{rng.randrange(100)}-{rng.randrange(24):02d}:"
                f"{rng.randrange(60):02d}:{rng.randrange(60):02d}"
            )
        elif form == 2:
            vals.append(f"{rng.randrange(100):02d}:{rng.randrange(60):02d}")
        elif form == 3:
            vals.append(
                f"{rng.randrange(100):02d}:{rng.randrange(60):02d}"
                f":{rng.randrange(6000)/100:05.2f}"
            )
        elif form == 4:
            vals.append(str(rng.randrange(10000)))
        else:
            vals.append(
                rng.choice(["UNLIMITED", "Partition_Limit", "", "garbage"])
            )
    from slurm2sql_spark.functions.converters import slurmtime

    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, s string")
    got = {
        r["i"]: r["p"]
        for r in df.select("i", slurmtime(F.col("s")).alias("p")).collect()
    }
    for i, v in enumerate(vals):
        want = _py_slurmtime(v)
        assert got[i] == pytest.approx(want) if want is not None else got[i] is None, (
            v, got[i], want,
        )


def test_fuzz_slurmmem(spark, rng):
    vals = []
    for _ in range(2000):
        num = rng.choice(
            [str(rng.randrange(10**6)), f"{rng.randrange(10**4)}.{rng.randrange(100):02d}"]
        )
        unit = rng.choice(["", "K", "M", "G", "T", "P"])
        suffix = rng.choice(["", "n", "c"])
        vals.append(f"{num}{unit}{suffix}")
    from slurm2sql_spark.functions.converters import slurmmem

    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, s string")
    got = {
        r["i"]: r["p"]
        for r in df.select("i", slurmmem(F.col("s")).alias("p")).collect()
    }
    for i, v in enumerate(vals):
        want = _py_slurmmem(v)
        assert got[i] == pytest.approx(want), (v, got[i], want)


def test_fuzz_jobid_grammar(spark, rng):
    vals = []
    for _ in range(2000):
        base = str(rng.randrange(1, 10**7))
        form = rng.randrange(5)
        if form == 1:
            base += f"_{rng.randrange(1000)}"
        elif form == 2:
            base += f"_[{rng.randrange(10)}-{rng.randrange(10, 99)}]"
        elif form == 3:
            base += f"+{rng.randrange(10)}"
        if rng.randrange(2):
            base += "." + rng.choice(
                ["batch", "extern", "0", str(rng.randrange(100))]
            )
        vals.append(base)
    from slurm2sql_spark.functions import jobid as J

    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, s string")
    got = {
        r["i"]: (r["nostep"], r["step"], r["only"], r["atask"])
        for r in df.select(
            "i",
            J.job_id_nostep(F.col("s")).alias("nostep"),
            J.job_step(F.col("s")).alias("step"),
            J.job_id_only(F.col("s")).alias("only"),
            J.array_task_id(F.col("s")).alias("atask"),
        ).collect()
    }
    for i, v in enumerate(vals):
        nostep, step, only, atask = _py_jobid_parts(v)
        g = got[i]
        assert g[0] == nostep and g[1] == step, (v, g)
        assert str(g[2]) == only, (v, g)
        assert (g[3] is None and atask is None) or int(g[3]) == atask, (v, g)
