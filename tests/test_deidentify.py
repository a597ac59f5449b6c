"""Deidentify (U3, reference deidentify.py): stable pseudonyms, null
passthrough, hash mode."""

from __future__ import annotations

from slurm2sql_spark.operators.deidentify import deidentify, value_dictionary


def _df(spark):
    return spark.createDataFrame(
        [
            ("alice", "proj1", 1),
            ("bob", "proj1", 2),
            ("alice", "proj2", 3),
            (None, "proj1", 4),
        ],
        "User string, Account string, n long",
    )


def test_value_dictionary_is_dense_and_sorted(spark):
    d = {
        r.value: r.pseudonym
        for r in value_dictionary(_df(spark), "User").collect()
    }
    assert d == {"alice": "User_0", "bob": "User_1"}


def test_deidentify_rank_mode(spark):
    out = deidentify(_df(spark), columns=("User", "Account")).collect()
    by_n = {r.n: (r.User, r.Account) for r in out}
    assert by_n[1] == ("User_0", "Account_0")
    assert by_n[2] == ("User_1", "Account_0")
    assert by_n[3] == ("User_0", "Account_1")
    assert by_n[4] == (None, "Account_0")  # null stays null
    # same value -> same pseudonym everywhere
    assert by_n[1][0] == by_n[3][0]


def test_deidentify_hash_mode(spark):
    out = deidentify(_df(spark), columns=("User",), numbering="hash").collect()
    vals = {r.n: r.User for r in out}
    assert vals[1] == vals[3] and vals[1] != vals[2]
    assert vals[1].startswith("User_")
    assert vals[4] is None

def test_deidentify_auto_switches_by_cardinality(spark):
    # User has 2 distinct values, n is near-unique: with a threshold of
    # 3, auto keeps rank numbering for User and hashes the high-card col
    df = spark.createDataFrame(
        [(f"u{i % 2}", f"line {i}") for i in range(40)],
        "User string, SubmitLine string",
    )
    out = deidentify(
        df, columns=("User", "SubmitLine"), numbering="auto", hash_threshold=3
    ).collect()
    users = {r.User for r in out}
    assert users == {"User_0", "User_1"}  # compact rank ids survive
    lines = {r.SubmitLine for r in out}
    assert len(lines) == 40  # hashed, still distinct
    assert all(v.startswith("SubmitLine_") for v in lines)
    # hash ids are not dense small integers
    assert not any(v in ("SubmitLine_0", "SubmitLine_1") for v in lines)


def test_value_dictionary_partitioned_rank_matches_global_order(spark):
    # 500 distinct values across many partitions: numbering must equal
    # the global sort order despite the partitioned two-phase rank
    vals = [(f"v{i:04d}",) for i in range(500)]
    df = spark.createDataFrame(vals, "User string").repartition(16)
    d = {r.value: r.pseudonym for r in value_dictionary(df, "User").collect()}
    assert len(d) == 500
    for i in range(500):
        assert d[f"v{i:04d}"] == f"User_{i}"
