from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bioclip_vector_db_spark.session import get_spark
from bioclip_vector_db_spark.sources.catalog import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


def assert_matches_oracle(spark_df, duck_con, oracle_sql):
    """Driver-style compare: column names, row count, canonically sorted values."""
    rel = duck_con.sql(oracle_sql)
    d_cols, d_rows = rel.columns, rel.fetchall()
    s_cols, s_rows = spark_df.columns, [tuple(r) for r in spark_df.collect()]
    assert sorted(s_cols) == sorted(d_cols), f"{sorted(s_cols)} != {sorted(d_cols)}"
    assert len(s_rows) == len(d_rows), f"rowcount {len(s_rows)} != {len(d_rows)}"

    def canon(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        return sorted(
            (tuple(r[i] for i in order) for r in rows),
            key=lambda t: tuple(str(x) for x in t),
        )

    for a, b in zip(canon(s_rows, s_cols), canon(d_rows, d_cols)):
        assert a == b, f"row mismatch: {a} != {b}"
