"""O9 real-model swap-in wiring (round-9 verdict item 7): the
predict_batch_udf path run with the deterministic kernel, proving the
REAL serving plumbing (per-worker loader singleton, numpy batch I/O,
normalization, contract asserts) end-to-end without model weights."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bioclip_vector_db_spark.operators import embedding as E
from bioclip_vector_db_spark.sources.catalog import load_table


def test_encoder_udf_matches_pandas_udf_kernel(spark, sf_dir):
    """The predict_batch_udf wiring with the stub loader must produce
    EXACTLY the md5 kernel's embeddings (same values as embed_text_udf
    and the pure-Catalyst twin): the wiring is semantics-preserving, so
    swapping in a real encoder changes only the loader."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(100)
    enc = E.make_encoder_udf(batch_size=7)  # odd batch size: exercise re-batching
    via_wiring = docs.select(
        "doc_id", F.posexplode(enc(F.col("text"))).alias("i", "c")
    ).select("doc_id", "i", F.round("c", 9).alias("c"))
    via_kernel = docs.select(
        "doc_id", F.posexplode(E.embed_text_udf(F.col("text"))).alias("i", "c")
    ).select("doc_id", "i", F.round("c", 9).alias("c"))
    assert sorted(map(tuple, via_wiring.collect())) == sorted(
        map(tuple, via_kernel.collect())
    )


def test_encoder_udf_output_passes_contract(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    enc = E.make_encoder_udf()
    out = E.assert_embedding_contract(
        docs.withColumn("embedding", enc(F.col("text")))
    )
    assert out.count() == 50  # contract assert evaluated, nothing raised


def test_contract_fails_loud_on_bad_dim(spark):
    df = spark.createDataFrame(
        [(1, [0.6, 0.8]), (2, [1.0])], "id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="contract violated"):
        E.assert_embedding_contract(df, dim=2).collect()


def test_contract_fails_loud_on_unnormalized(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0])], "id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="contract violated"):
        E.assert_embedding_contract(df, dim=2).collect()


def test_bad_encoder_shape_fails_loud(spark, sf_dir):
    """A model returning the wrong width must fail the job with the
    wiring's shape error, not feed garbage downstream."""

    def bad_loader():
        import numpy as np

        return lambda texts: np.ones((len(texts), E.EMBED_DIM + 1))

    docs = load_table(spark, sf_dir, "documents").select("text").limit(10)
    enc = E.make_encoder_udf(model_loader=bad_loader)
    with pytest.raises(Exception, match="encoder returned shape"):
        docs.select(enc(F.col("text")).alias("e")).collect()


def test_resolve_model_loader_env(monkeypatch):
    monkeypatch.delenv(E.EMBED_MODEL_ENV, raising=False)
    assert E.resolve_model_loader() is not None
    monkeypatch.setenv(E.EMBED_MODEL_ENV, "hf:some/model")
    assert E.resolve_model_loader() is not None  # loader built lazily
    monkeypatch.setenv(E.EMBED_MODEL_ENV, "bogus")
    with pytest.raises(ValueError, match="unrecognized"):
        E.resolve_model_loader()


def test_stub_loader_rejects_dim_over_digest_width():
    """One md5 hexdigest holds 32 nibbles; dim > 32 used to silently
    yield short rows that only failed later with the generic shape
    error (ADVICE r9). The loader now fails at construction, loudly."""
    with pytest.raises(ValueError, match="dim <= 32"):
        E._stub_loader(33)
    assert E._stub_loader(32)()(["x"]).shape == (1, 32)
