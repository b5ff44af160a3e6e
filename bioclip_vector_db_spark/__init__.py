"""bioclip_vector_db_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of Imageomics/bioclip-vector-db.

The reference system (see /root/reference) is a vector database for
nearest-neighbor retrieval over BioCLIP image embeddings: an offline indexing
pipeline (embed -> k-means partition -> partitioned store + id/metadata
sidecar) and an online two-tier scatter-gather top-k search.

This package re-expresses every one of those capabilities as declarative
Spark DataFrame pipelines (SURVEY.md section 2 is the operator inventory):

- ``sources``   — table catalog over the parquet lakehouse (T1-T5 analogs)
                  plus the binaryFile shard scan (O2).
- ``functions`` — columnar expression helpers: vector math (cosine/dot/
                  normalize) as Catalyst higher-order functions.
- ``operators`` — the dataflow operators, one module each:
                  ``knn`` (serving path O22-O28, X3/X4), ``indexing``
                  (O6, O17-O20, O25/O26), ``relational`` (O14/O15/O28),
                  ``taxon`` (O8 caption parse), ``dedup`` (X1/X2 content
                  hash + MinHash LSH + simhash), ``text`` (X5 analysis),
                  ``embedding`` (O9/O10 pandas-UDF stub), ``multimodal``
                  (X6 binary columns), ``quantization`` (O21 int8 coarse
                  search + exact rescore), ``tpch`` (generic relational).
- ``plans``     — the query registry that backs ``__spark_entry__.py``:
                  every declared query + its DuckDB oracle SQL twin.
- ``streaming`` — Structured Streaming over the events table (X7).
- ``pipeline``  — the reference's entry point 1 as one composable batch job
                  (shards -> parse -> embed -> dedup -> build index).
- ``api``       — the reference's serving call surface (search/search_batch/
                  health/query/add_batch/reset) over the built index.

Design stance: DataFrame/SQL first; Catalyst does pushdown/pruning/join
selection; Python appears only in Arrow-batched pandas UDFs on genuinely
non-relational kernels. Everything is built for horizontal scale: broadcast
the small side, partition-prune the big side, map-side-combine aggregations,
and two-phase top-k (WindowGroupLimit) for ranking.
"""

__version__ = "0.1.0"
