"""O8: taxon-tag caption parsing — the reference's only unit-tested operator.

The reference parses TreeOfLife captions like::

    a photo of kingdom Animalia phylum Arthropoda class Insecta order
    Lepidoptera family Geometridae genus Charissa species mucidaria with
    common name coppery taupe.

into 8 rank strings + the raw tag, with every missing/blank rank as ``""``
(never NULL) and values stripped (reference: src/bioclip_vector_db/
parse_utils.py:9-65; every web-ingest row passes through it,
vector_db.py:158-160). Its 10 golden unit tests
(tests/parse_utils_test.py:6-208) are the behavioral spec; they are inlined
here as the fixture corpus and re-asserted in tests/test_taxon.py.

Spark side: 8 ``regexp_extract`` Catalyst expressions over the reference's
exact lookahead-bounded regex (Java regex supports lookaheads), so the
semantics — including the "no overall match => all defaults" gate — are
preserved verbatim. Pure whole-stage-codegen string work: at 100 TB this is
a map-only stage fused into the scan, no shuffle, no Python.

Oracle side: DuckDB's RE2 has no lookaheads, so the oracle extracts each
rank independently with a consumed-boundary pattern
(`` kingdom (.*?)(?: phylum|...|\\.)``). On well-formed tags (and on all 10
golden cases) the two formulations agree; the Spark expression is the
faithful one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register

#: Rank markers in caption order (parse_utils.py:36-45). ``common name`` is
#: prefixed by ``with`` in the caption grammar.
RANKS = ("kingdom", "phylum", "class", "order", "family", "genus", "species")

#: Output column for each capture group, in order.
OUT_COLS = ("kingdom", "phylum", "class", "order", "family", "genus", "species", "common_name")

#: The reference's parsing regex, verbatim semantics (parse_utils.py:25-35):
#: "a photo of" + 8 optional lookahead-bounded lazy groups + terminal ".".
FULL_REGEX = (
    "a photo of"
    "(?: kingdom (.*?)(?= phylum| class| order| family| genus| species| with common name|\\.))?"
    "(?: phylum (.*?)(?= class| order| family| genus| species| with common name|\\.))?"
    "(?: class (.*?)(?= order| family| genus| species| with common name|\\.))?"
    "(?: order (.*?)(?= family| genus| species| with common name|\\.))?"
    "(?: family (.*?)(?= genus| species| with common name|\\.))?"
    "(?: genus (.*?)(?= species| with common name|\\.))?"
    "(?: species (.*?)(?= with common name|\\.))?"
    "(?: with common name (.*?))?\\."
)


def parse_taxon_tag(tag: Column) -> list[Column]:
    """The 8 rank columns for one caption column — Catalyst expressions only.

    ``regexp_extract`` returns ``""`` both when the whole regex fails to
    match and when an optional group did not participate — exactly the
    reference's all-defaults behavior; ``trim`` mirrors its ``.strip()``.
    """
    return [
        F.trim(F.regexp_extract(tag, FULL_REGEX, i + 1)).alias(OUT_COLS[i])
        for i in range(len(OUT_COLS))
    ]


def parse_taxon_tags(df: DataFrame, tag_col: str = "tag") -> DataFrame:
    """Project a caption DataFrame to the parsed 9-field taxon surface
    (8 ranks + raw_tag) — the ingest-path projection every TreeOfLife row
    goes through (vector_db.py:158-160)."""
    keep = [c for c in df.columns if c != tag_col]
    return df.select(
        *keep,
        *parse_taxon_tag(F.col(tag_col)),
        F.col(tag_col).alias("raw_tag"),
    )


# ---------------------------------------------------------------------------
# Golden fixture: the reference's 10 unit-test cases
# (tests/parse_utils_test.py:6-208; table spec in FIXTURES.md Part B).
# ---------------------------------------------------------------------------

GOLDEN_TAGS: tuple[tuple[int, str], ...] = (
    (1, ""),
    (
        2,
        "a photo of kingdom  phylum  class  order  family  genus  "
        "species  with common name .",
    ),
    (
        3,
        "a photo of kingdom a_kingdom phylum a_phylum class a_class order "
        "an_order family a_family genus a_genus species a_species with common name a_common_name.",
    ),
    (
        4,
        "a photo of kingdom a_kingdom suffix phylum a_phylum class a_class order "
        "an_order family a_family genus a_genus species a_species suffix with common name "
        "a_common_name with long suffix.",
    ),
    (
        5,
        "a photo of kingdom a_kingdom phylum a_phylum class a_class order "
        "an_order family a_family genus a_genus species a_species with common name .",
    ),
    (
        6,
        "a photo of kingdom a_kingdom phylum a_phylum class a_class order "
        "an_order family a_family genus a_genus species  with common name .",
    ),
    (
        7,
        "a photo of kingdom  phylum a_phylum class a_class order "
        "an_order family a_family genus a_genus species a_species with common name a_common_name.",
    ),
    (8, "a photo of species species with common name common_name."),
    (9, "a photo of kingdom a_kingdom species a_species."),
    (
        10,
        "a photo of kingdom Animalia phylum Arthropoda "
        "class Insecta order Lepidoptera family Geometridae genus Charissa "
        "species mucidaria with common name coppery taupe.",
    ),
)


def golden_tag_df(spark: SparkSession) -> DataFrame:
    """The golden caption corpus as a DataFrame ``(tag_id INT, tag STRING)``."""
    return spark.createDataFrame(list(GOLDEN_TAGS), "tag_id int, tag string")


def _oracle_rank_pattern(rank_idx: int) -> str:
    """Consumed-boundary RE2 pattern for one rank (DuckDB side)."""
    if rank_idx == len(RANKS):  # common name
        return " with common name (.*?)\\."
    following = [f" {r}" for r in RANKS[rank_idx + 1 :]] + [" with common name"]
    return f" {RANKS[rank_idx]} (.*?)(?:{'|'.join(following)}|\\.)"


def _oracle_values_sql() -> str:
    rows = ",\n    ".join(
        "({}, '{}')".format(tid, tag.replace("'", "''")) for tid, tag in GOLDEN_TAGS
    )
    return f"(VALUES\n    {rows}\n) AS t(tag_id, tag)"


def _oracle_sql() -> str:
    extracts = []
    for i, col in enumerate(OUT_COLS):
        pat = _oracle_rank_pattern(i).replace("'", "''")
        extracts.append(f"trim(regexp_extract(tag, '{pat}', 1)) AS \"{col}\"")
    cols = ",\n       ".join(extracts)
    return f"""
SELECT tag_id,
       {cols},
       tag AS raw_tag
FROM {_oracle_values_sql()}
"""


@register("taxon_parse", oracle=_oracle_sql())
def q_taxon_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O8 [Q]: parse the 10 golden captions into the 9-field taxon surface.
    Missing ranks are '' (never NULL), values stripped — the reference's
    exact tested behavior."""
    return parse_taxon_tags(golden_tag_df(spark), "tag").select(
        "tag_id", *OUT_COLS, "raw_tag"
    )
