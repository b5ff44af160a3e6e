"""Property-based tests (hypothesis): invariants the golden cases can't
exhaust — parser round-trips on arbitrary well-formed captions, spec
expansion engine-equivalence, quantization error bounds."""

from __future__ import annotations

import hashlib
import math

from hypothesis import given, settings, strategies as st

from bioclip_vector_db_spark.operators.embedding import _md5_embed
from bioclip_vector_db_spark.operators.relational import expand_partition_spec
from bioclip_vector_db_spark.operators.taxon import FULL_REGEX, OUT_COLS

_MARKERS = {"kingdom", "phylum", "class", "order", "family", "genus", "species", "with", "common", "name", "photo", "of", "a"}

_word = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=3, max_size=8).filter(
    lambda w: w not in _MARKERS
)


@given(st.lists(_word, min_size=8, max_size=8))
@settings(max_examples=50, deadline=None)
def test_taxon_regex_roundtrips_wellformed_captions(words):
    """Any well-formed caption parses back to its 8 rank values — checked
    against the exact regex the Catalyst expression uses (Python re and
    Java regex agree on this pattern class)."""
    import re

    caption = (
        f"a photo of kingdom {words[0]} phylum {words[1]} class {words[2]} "
        f"order {words[3]} family {words[4]} genus {words[5]} "
        f"species {words[6]} with common name {words[7]}."
    )
    m = re.search(FULL_REGEX, caption)
    assert m is not None
    got = [(g or "").strip() for g in m.groups()]
    assert got == words


@given(
    st.lists(
        st.one_of(
            st.integers(0, 99).map(str),
            st.tuples(st.integers(0, 50), st.integers(0, 49)).map(
                lambda t: f"{t[0]}-{t[0] + t[1]}"
            ),
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=100, deadline=None)
def test_partition_spec_expansion_properties(tokens):
    """Sorted, deduped, and complete: every range member appears exactly
    once regardless of token order/overlap (neighborhood_server.py:353-365
    semantics)."""
    spec = ",".join(tokens)
    got = expand_partition_spec(spec)
    want = set()
    for t in tokens:
        if "-" in t:
            lo, hi = map(int, t.split("-"))
            want.update(range(lo, hi + 1))
        else:
            want.add(int(t))
    assert got == sorted(want)


@given(st.text(min_size=0, max_size=200))
@settings(max_examples=100, deadline=None)
def test_pseudo_embedding_unit_norm_and_deterministic(text):
    v = _md5_embed(text)
    assert len(v) == 8
    assert abs(math.fsum(x * x for x in v) - 1.0) < 1e-9
    assert v == _md5_embed(text)
    # and it is the md5-nibble kernel it claims to be
    h = hashlib.md5(text.encode()).hexdigest()
    raw = [int(c, 16) - 7.5 for c in h[:8]]
    n = math.sqrt(sum(x * x for x in raw))
    assert all(abs(a - b / n) < 1e-12 for a, b in zip(v, raw))
