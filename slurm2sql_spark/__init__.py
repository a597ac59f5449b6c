"""slurm2sql_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of NordicHPC/slurm2sql.

Built from scratch on the Spark DataFrame/SQL stack: the reference's
row-at-a-time Python+SQLite pipeline (reference slurm2sql.py:1008-1034)
becomes a single declarative column projection Catalyst can optimize,
its SQLite views become DataFrame builders, and its hand-rolled
incremental protocol becomes a watermarked merge pipeline.

Public surface:
- ``session.get_spark()`` — tuned local/cluster SparkSession
- ``functions.*`` — converter Column-expression library (units,
  durations, TRES extraction, JobID grammar)
- ``operators.transform.slurm_transform`` — raw sacct text -> typed table
- ``operators.views`` — allocations / steps / eff / user rollup
- ``sources.*`` — CSV + sacct line sources
- ``sinks.*`` — parquet sink with keyed upsert
- ``streaming.history`` — incremental ingest with resume watermark
"""

__version__ = "0.1.0"
