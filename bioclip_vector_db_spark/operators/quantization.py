"""O21: scalar quantization of embedding vectors.

The reference stores vectors as fp16 inside FAISS (``SQfp16`` in the index
factory string, reference: src/bioclip_vector_db/storage/storage_impl.py:87)
to halve index memory. Spark SQL has no fp16, so the engine offers int8
scalar quantization instead (4x smaller than fp32, vs the reference's 2x):

- ``quantize_i8``: clamp to [-1, 1] (valid for L2-normalized embeddings,
  the corpus invariant — vector_db.py:112-114) and scale to [-127, 127]
  bytes, as a pure Catalyst ``transform``;
- ``dequantize_i8``: the inverse, for rescoring;
- the serving pattern that makes lossy storage safe: COARSE search on the
  quantized vectors (integer dot products over 1/4 the bytes), then EXACT
  rescore of the small candidate set with the fp32 vectors — the standard
  SQ/ADC + refine layout, here two Catalyst stages where the second only
  touches ``refine_k`` rows per query.

At 100 TB the quantized corpus is the hot scan (25% of the bytes => 4x the
scan throughput); the fp32 rescore reads only the candidate rows back via
an id join against the (co-partitioned) full-precision table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine_distance
from ..plans.registry import register
from ..sources.catalog import load_table

I8_SCALE = 127


def quantize_i8(vec: Column) -> Column:
    """ARRAY<numeric> in [-1,1] -> ARRAY<TINYINT> in [-127,127]."""
    return F.transform(
        vec.cast("array<double>"),
        lambda x: F.round(F.greatest(F.lit(-1.0), F.least(F.lit(1.0), x)) * I8_SCALE).cast(
            "tinyint"
        ),
    )


def dequantize_i8(qvec: Column) -> Column:
    """ARRAY<TINYINT> -> ARRAY<DOUBLE>, the lossy inverse."""
    return F.transform(qvec, lambda x: x.cast("double") / I8_SCALE)


def quantized_distance(qa: Column, qb: Column) -> Column:
    """1 - (integer dot / scale^2): the coarse distance over quantized
    vectors. Integer multiply-accumulate — products are cast to INT up
    front (byte*byte would overflow)."""
    dot = F.aggregate(
        F.zip_with(qa, qb, lambda x, y: x.cast("int") * y.cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return F.round(F.lit(1.0) - dot.cast("double") / (I8_SCALE * I8_SCALE), 9)


def knn_quantized_rescore(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    coarse_k: int = 20,
    k: int = 5,
) -> DataFrame:
    """Coarse int8 top-``coarse_k`` per query, exact fp32 rescore to
    top-``k``. ``queries``: (query_id, qv); ``corpus``: (vec_id, embedding).
    """
    q = F.broadcast(
        queries.select("query_id", "qv", quantize_i8(F.col("qv")).alias("q_qv"))
    )
    c = corpus.select("vec_id", "embedding", quantize_i8(F.col("embedding")).alias("q_emb"))
    coarse = c.join(q).select(
        "query_id",
        "qv",
        "vec_id",
        "embedding",
        quantized_distance(F.col("q_qv"), F.col("q_emb")).alias("coarse_distance"),
    )
    w_coarse = Window.partitionBy("query_id").orderBy(
        F.col("coarse_distance").asc(), F.col("vec_id").asc()
    )
    cands = coarse.withColumn("coarse_rank", F.row_number().over(w_coarse)).filter(
        F.col("coarse_rank") <= coarse_k
    )
    rescored = cands.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine_distance(F.col("qv"), F.col("embedding")).alias("distance"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("distance").asc(), F.col("neighbor_id").asc())
    return rescored.withColumn("rank", F.row_number().over(w).cast("bigint")).filter(
        F.col("rank") <= k
    )


_QUANT_SQL = (
    f"list_transform(embedding::DOUBLE[], "
    f"x -> round(greatest(-1.0, least(1.0, x)) * {I8_SCALE})::INT)"
)

_RESCORE_ORACLE = f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, {_QUANT_SQL} AS q_qv
    FROM embeddings WHERE vec_id < 5
),
c AS (
    SELECT vec_id, embedding::DOUBLE[] AS emb, {_QUANT_SQL} AS q_emb
    FROM embeddings WHERE vec_id >= 5
),
coarse AS (
    SELECT q.query_id, q.qv, c.vec_id, c.emb,
           round(1.0 - list_dot_product(q.q_qv, c.q_emb) / {I8_SCALE * I8_SCALE}.0, 9)
               AS coarse_distance
    FROM q CROSS JOIN c
),
cands AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY coarse_distance, vec_id) AS coarse_rank
        FROM coarse
    ) WHERE coarse_rank <= 20
),
rescored AS (
    SELECT query_id, vec_id AS neighbor_id,
           round(1.0 - list_dot_product(qv, emb), 9) AS distance
    FROM cands
)
SELECT query_id, neighbor_id, distance, rank FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY distance, neighbor_id) AS rank
    FROM rescored
) WHERE rank <= 5
"""


@register("knn_quantized_rescore", oracle=_RESCORE_ORACLE)
def q_knn_quantized_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O21 [Q]: int8 coarse search + exact fp32 rescore — the scalar-
    quantization serving pattern (the engine's answer to the reference's
    SQfp16 storage), 5 fixture queries vs the rest of the corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    corpus = emb.filter(F.col("vec_id") >= 5).select("vec_id", "embedding")
    return knn_quantized_rescore(queries, corpus, coarse_k=20, k=5)
