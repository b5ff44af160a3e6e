"""Table catalog over the parquet lakehouse.

The reference scans Hugging Face datasets / WebDataset tar shards
(reference: src/bioclip_vector_db/vector_db.py:63-86, O1/O2 in SURVEY.md);
here every table is a parquet source read declaratively so Catalyst gets
predicate pushdown, column pruning, and partition pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: All driver-fixture tables (TESTDATA.md) — TPC-H-ish star schema plus
#: events (stream analog), documents (text corpus), embeddings (vector corpus).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Scans stay columnar + prunable.

    The ``events`` fixture stores TIMESTAMP(NANOS), which Spark's parquet
    reader rejects by default. The legacy conf is a *runtime* SQL conf, so it
    is set here — on whichever session runs the query (the driver supplies
    its own SparkSession; configuring only our session factory is not
    enough). The nanos column is converted to a proper TIMESTAMP (micros;
    the fixture's values are micro-precision, so the cast is lossless).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Window/date_trunc math happens in the session timezone; the
        # fixture timestamps are naive (and the DuckDB oracle treats them
        # as such), so pin UTC regardless of the caller's session config.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":
            # Integer DIV: float division would lose microsecond precision
            # at nanosecond magnitudes (~1.7e18 exceeds double's 53 bits).
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register fixture tables as temp views so operators can be written in SQL."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
