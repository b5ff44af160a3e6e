"""Vectorized KNN kernel: blocked numpy matrix products via ``mapInPandas``.

SURVEY.md §4.2 calls this swap out explicitly: the Catalyst
``aggregate(zip_with(...))`` similarity kernel is JVM-side but per-row and
interpreted (higher-order functions don't enter whole-stage codegen); when
a profile shows the dot product itself dominating, the same logical plan
can score each Arrow batch as ONE ``E @ Q.T`` BLAS call.

Shape (identical distribution semantics to ``knn.knn_join``):
1. the query side is small by contract (the reference serves one vector per
   request; batch mode broadcasts a bounded query set) — it ships to every
   task as a captured numpy matrix, the closure analog of a broadcast join;
2. each corpus Arrow batch emits only its local top-k per query
   (``argpartition``, O(b) per query) — the map-side pre-limit that
   WindowGroupLimit provides in the expression version;
3. a final window over #tasks x k x #queries candidate rows picks the
   global top-k. Shuffle volume is O(k) per query per task, never O(corpus).

Numeric note: BLAS accumulation order differs from the expression fold, so
distances can differ in the last ulp — results are rank-identical on
separated data but NOT guaranteed hash-identical, which is why this kernel
backs the library/tests rather than an oracle-gated query.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CAND_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("distance", T.DoubleType()),
    ]
)


def knn_join_numpy(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    *,
    query_id_col: str = "query_id",
    query_vec_col: str = "qv",
    corpus_id_col: str = "vec_id",
    corpus_vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine join with a BLAS inner loop.
    Returns ``(query_id, neighbor_id, distance, rank)`` like ``knn_join``."""
    qrows = queries.select(query_id_col, query_vec_col).collect()
    if not qrows:
        spark = queries.sparkSession
        empty = spark.createDataFrame([], _CAND_SCHEMA)
        return empty.withColumn("rank", F.lit(None).cast("bigint"))
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)  # q x d

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            emb = np.array(list(pdf[corpus_vec_col]), dtype=np.float64)  # b x d
            ids = pdf[corpus_id_col].to_numpy(dtype=np.int64)
            dist = 1.0 - emb @ qmat.T  # b x q
            top = min(k, len(pdf))
            out_q, out_n, out_d = [], [], []
            for j in range(len(qids)):
                idx = np.argpartition(dist[:, j], top - 1)[:top]
                out_q.append(np.full(top, qids[j]))
                out_n.append(ids[idx])
                out_d.append(np.round(dist[idx, j], 9))
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "distance": np.concatenate(out_d),
                }
            )

    cands = corpus.select(corpus_id_col, corpus_vec_col).mapInPandas(score, _CAND_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.col("distance").asc(), F.col("neighbor_id").asc())
    return (
        cands.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )
