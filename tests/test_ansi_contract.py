"""Driver-contract regression: the round driver hands the catalog ITS
OWN SparkSession with Spark-4 defaults, i.e. ANSI mode ON. `catalog._t`
pins `spark.sql.ansi.enabled=false` at build time, but any entry that
bypasses `_t` (or any expression evaluated before `_t` runs) must be
null-safe under ANSI. This test runs every catalog entry end-to-end
with ANSI re-enabled before each build — the exact driver sequence —
so a regression fails here instead of in the round gate.
"""

from __future__ import annotations
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.slow
def test_every_catalog_query_survives_ansi_session(spark):
    from slurm2sql_spark import catalog

    catalog.drop_caches()
    failures = []
    for name, spec in catalog.QUERIES.items():
        # the driver's session state: ANSI on before the entry builds
        spark.conf.set("spark.sql.ansi.enabled", "true")
        try:
            n = spec.spark(spark, SF_DIR).count()
            assert n >= 0
        except Exception as exc:  # noqa: BLE001
            failures.append((name, str(exc)[:200]))
    spark.conf.set("spark.sql.ansi.enabled", "false")
    catalog.drop_caches()
    assert not failures, failures
