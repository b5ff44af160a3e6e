"""lit_array must be a pure construction-cost optimization: the Column it
builds parses to the IDENTICAL expression tree as the per-element
``F.array(*[F.lit(v) ...])`` form — same schema (including
containsNull=false) and byte-identical optimized plan modulo expression
ids — for every element type the operators use."""

import re

import pytest
from pyspark.sql import functions as F

from bioclip_vector_db_spark.functions.vector import lit_array


def _strip_ids(plan: str) -> str:
    return re.sub(r"#\d+", "#", plan)


def _optimized(df) -> str:
    return _strip_ids(df._jdf.queryExecution().optimizedPlan().toString())


@pytest.mark.parametrize(
    "values",
    [
        [1.0, -1.0, 0.5, -0.25, 1e-9],
        [0, 1, 3, 255, 2**20],
        ["a", "it's", "b c", ""],
        [True, False, True],
        ["back\\slash", "\\", "a\\'b", "c\\\\d", "tab\there", "nl\nhere"],
    ],
    ids=["float", "int", "str", "bool", "str_escapes"],
)
def test_lit_array_matches_per_element_form(spark, values):
    df = spark.range(1)
    old = df.select(F.array(*[F.lit(v) for v in values]).alias("x"))
    new = df.select(lit_array(values).alias("x"))
    assert old.schema == new.schema
    assert _optimized(old) == _optimized(new)
    assert old.collect() == new.collect()


def test_lit_array_accepts_generators(spark):
    df = spark.range(1)
    a = df.select(lit_array(float(x) for x in range(4)).alias("x"))
    b = df.select(lit_array([0.0, 1.0, 2.0, 3.0]).alias("x"))
    assert a.collect() == b.collect()


def test_lit_array_rejects_non_finite_floats():
    with pytest.raises(ValueError):
        lit_array([float("nan")])
    with pytest.raises(ValueError):
        lit_array([float("inf")])


def test_lit_array_rejects_empty_input():
    # array() would carry a version-dependent element type, unlike any
    # typed per-element form; no call site passes an empty sequence.
    with pytest.raises(ValueError):
        lit_array([])


def test_lit_array_pathological_strings_round_trip(spark):
    """Fuzz-ish parity pin (r16 VERDICT item 4 wrap-up): every printable
    ASCII char, quote/backslash runs, and C-escape lookalikes must parse
    to exactly the F.lit values."""
    import string

    values = [
        string.printable,
        "\\n",  # backslash + n, NOT a newline
        "\\\\",
        "''",
        "\\'",
        "%s %% {x} $y",
        "semi;colon -- comment /* block */",
    ]
    df = spark.range(1)
    old = df.select(F.array(*[F.lit(v) for v in values]).alias("x"))
    new = df.select(lit_array(values).alias("x"))
    assert old.schema == new.schema
    assert old.collect() == new.collect()


def test_dot_product_dim_fast_path_matches_fold(spark):
    """The dim-hinted straight-line dot product must be value-identical to
    the fold on every input shape: matching dim (fast branch), equal-but-
    shorter arrays (falls back via the size guard), length mismatch (both
    forms null the total), null elements, and null arrays (r17)."""
    import math

    from pyspark.sql import functions as F

    from bioclip_vector_db_spark.functions.vector import dot_product

    rows = [
        ([1.0, 2.0, 3.0, 4.0], [0.5, 0.25, -1.0, 2.0]),  # == dim
        ([0.1] * 4, [0.3] * 4),                          # float-noise accumulation
        ([1.0, 2.0], [3.0, 4.0]),                        # equal length != dim
        ([1.0, 2.0, 3.0], [1.0, 2.0]),                   # mismatch -> NULL
        ([1.0, None, 3.0, 4.0], [1.0, 1.0, 1.0, 1.0]),   # null element -> NULL
        (None, [1.0, 2.0, 3.0, 4.0]),                    # null array -> NULL
    ]
    df = spark.createDataFrame(rows, "a array<double>, b array<double>")
    got = df.select(
        dot_product(F.col("a"), F.col("b")).alias("fold"),
        dot_product("a", "b", dim=4).alias("fast"),
    ).collect()
    for r in got:
        if r["fold"] is None:
            assert r["fast"] is None
        else:
            # bit-identical, not approximately equal: same op order
            assert math.isclose(r["fast"], r["fold"], rel_tol=0.0, abs_tol=0.0)


def test_dot_product_dim_fast_path_guards():
    import pytest

    from bioclip_vector_db_spark.functions.vector import dot_product

    from pyspark.sql import functions as F

    with pytest.raises(TypeError):
        dot_product(F.col("a"), F.col("b"), dim=4)  # Columns: py4j-per-node trap
    with pytest.raises(ValueError):
        dot_product("a", "b", dim=0)
    with pytest.raises(ValueError):
        dot_product("a`b", "b", dim=4)
