"""O8 taxon-tag parser: the reference's 10 golden cases, re-asserted against
the Catalyst implementation (reference: tests/parse_utils_test.py:6-208 is
the behavioral spec; expected outputs below are those goldens verbatim)."""

from __future__ import annotations

from bioclip_vector_db_spark.operators import taxon
from bioclip_vector_db_spark.plans.registry import ORACLES, QUERIES

from .conftest import assert_matches_oracle

_ALL_BLANK = {
    "kingdom": "",
    "phylum": "",
    "class": "",
    "order": "",
    "family": "",
    "genus": "",
    "species": "",
    "common_name": "",
}

#: tag_id -> expected 8-rank dict (raw_tag is always the input itself).
GOLDEN_EXPECTED = {
    1: _ALL_BLANK,
    2: _ALL_BLANK,
    3: {
        "kingdom": "a_kingdom",
        "phylum": "a_phylum",
        "class": "a_class",
        "order": "an_order",
        "family": "a_family",
        "genus": "a_genus",
        "species": "a_species",
        "common_name": "a_common_name",
    },
    4: {
        "kingdom": "a_kingdom suffix",
        "phylum": "a_phylum",
        "class": "a_class",
        "order": "an_order",
        "family": "a_family",
        "genus": "a_genus",
        "species": "a_species suffix",
        "common_name": "a_common_name with long suffix",
    },
    5: {
        "kingdom": "a_kingdom",
        "phylum": "a_phylum",
        "class": "a_class",
        "order": "an_order",
        "family": "a_family",
        "genus": "a_genus",
        "species": "a_species",
        "common_name": "",
    },
    6: {
        "kingdom": "a_kingdom",
        "phylum": "a_phylum",
        "class": "a_class",
        "order": "an_order",
        "family": "a_family",
        "genus": "a_genus",
        "species": "",
        "common_name": "",
    },
    7: {
        "kingdom": "",
        "phylum": "a_phylum",
        "class": "a_class",
        "order": "an_order",
        "family": "a_family",
        "genus": "a_genus",
        "species": "a_species",
        "common_name": "a_common_name",
    },
    8: {**_ALL_BLANK, "species": "species", "common_name": "common_name"},
    9: {**_ALL_BLANK, "kingdom": "a_kingdom", "species": "a_species"},
    10: {
        "kingdom": "Animalia",
        "phylum": "Arthropoda",
        "class": "Insecta",
        "order": "Lepidoptera",
        "family": "Geometridae",
        "genus": "Charissa",
        "species": "mucidaria",
        "common_name": "coppery taupe",
    },
}


def test_golden_cases(spark):
    rows = {r["tag_id"]: r.asDict() for r in QUERIES["taxon_parse"](spark, "").collect()}
    tags = dict(taxon.GOLDEN_TAGS)
    assert set(rows) == set(GOLDEN_EXPECTED)
    for tid, want in GOLDEN_EXPECTED.items():
        got = rows[tid]
        assert got["raw_tag"] == tags[tid], tid
        for col, val in want.items():
            assert got[col] == val, (tid, col, got[col], val)
        # Missing ranks are empty strings, never NULL (parse_utils.py:49-55).
        assert all(v is not None for v in got.values()), tid


def test_oracle_parity(spark, duck):
    assert_matches_oracle(
        QUERIES["taxon_parse"](spark, ""), duck, ORACLES["taxon_parse"]
    )


def test_no_overall_match_yields_defaults(spark):
    """A caption without the 'a photo of ... .' envelope parses to all
    defaults — the reference's no-match branch (parse_utils.py:51-57)."""
    df = spark.createDataFrame(
        [(1, "kingdom Foo species Bar"), (2, "a photo of something else")],
        "tag_id int, tag string",
    )
    out = taxon.parse_taxon_tags(df, "tag").collect()
    for r in out:
        for col in taxon.OUT_COLS:
            assert r[col] == "", (r["tag_id"], col)
