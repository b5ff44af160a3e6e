"""JSONL (newline-delimited JSON) source — the interchange format most
text-pipeline corpora actually arrive in (one document object per line).

The reference ingests via HF datasets / WebDataset only; JSONL extends the
O1 source family the same way sources/webdataset.py does: fixture STAGING
is driver-side, the SCAN is the distributed path (`spark.read.json` with
an explicit schema — never schema inference, which would read the corpus
twice and produce fixture-dependent types).

Malformed lines are ISOLATED, not fatal: PERMISSIVE mode routes any
unparseable line into `_corrupt` (columnNameOfCorruptRecord), so one bad
record in a 100-TB crawl drop cannot kill the job; the roundtrip gate
plants one malformed line per staged file and proves the good rows
survive bit-exact while the bad ones are excluded by a map-side filter.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register

#: Explicit scan schema: corrupt lines land in _corrupt, good lines parse
#: into typed columns. (Spark requires the corrupt column to exist in the
#: schema when columnNameOfCorruptRecord is set.)
JSONL_SCHEMA = "doc_id long, text string, lang string, n_chars long, _corrupt string"


def read_jsonl(spark: SparkSession, path: str, glob: str = "*.jsonl") -> DataFrame:
    """Schema-enforced JSONL scan with corrupt-record isolation."""
    return (
        spark.read.schema(JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .option("pathGlobFilter", glob)
        .json(path)
    )


def _stage_document_jsonl(sf_dir: str, n_files: int = 4) -> str:
    """Write the documents fixture as ``n_files`` JSONL files (doc_id % n
    routing, sorted within file) plus ONE deliberately malformed line per
    file — deterministic content, published once per source fixture via
    the same content-addressed atomic staging + stale-sibling reaping as
    the WebDataset shards."""
    import pyarrow.parquet as pq

    from ..streaming.staging import _publish_atomically, _reap_stale_gate_siblings

    src = os.path.join(sf_dir, "documents.parquet")
    stamp = hashlib.md5(
        (str(os.path.getmtime(src)) + str(os.path.getsize(src)) + str(n_files)).encode()
    ).hexdigest()
    out = os.path.join(tempfile.gettempdir(), f"bvds_jsonl_{stamp[:12]}")
    _reap_stale_gate_siblings("bvds_jsonl", keep=out)

    def build(tmp: str) -> None:
        tbl = pq.read_table(src, columns=["doc_id", "text", "lang", "n_chars"])
        rows = sorted(
            zip(
                tbl["doc_id"].to_pylist(),
                tbl["text"].to_pylist(),
                tbl["lang"].to_pylist(),
                tbl["n_chars"].to_pylist(),
            )
        )
        files = [
            open(os.path.join(tmp, f"part-{i}.jsonl"), "w") for i in range(n_files)
        ]
        try:
            for doc_id, text, lang, n_chars in rows:
                files[doc_id % n_files].write(
                    json.dumps(
                        {
                            "doc_id": doc_id,
                            "text": text,
                            "lang": lang,
                            "n_chars": n_chars,
                        },
                        sort_keys=True,
                    )
                    + "\n"
                )
            for i, fh in enumerate(files):
                fh.write(f'{{"doc_id": "NOT-A-NUMBER", "text": truncated-{i}\n')
        finally:
            for fh in files:
                fh.close()

    return _publish_atomically(build, out, stamp)


@register(
    "jsonl_scan_roundtrip",
    oracle="""
SELECT doc_id, text, lang, n_chars FROM documents
""",
)
def q_jsonl_scan_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+ [Q]: the JSONL interchange scan end-to-end — the documents
    fixture staged as 4 JSONL files with one planted malformed line each,
    read back with an explicit schema in PERMISSIVE mode; good rows must
    hash-match the source table exactly (malformed lines isolated into
    _corrupt and excluded by a map-side filter, never by failing the
    scan)."""
    staged = _stage_document_jsonl(sf_dir)
    df = read_jsonl(spark, staged)
    # The filter references doc_id ALONGSIDE the corrupt column: a plan
    # whose only referenced column is the corrupt record (e.g. a bare
    # count() pruning away the projection) is rejected by Spark
    # (QUERY_ONLY_CORRUPT_RECORD_COLUMN); anchoring a real column keeps
    # every downstream shape legal. Semantically redundant — a corrupt
    # line parses every typed field as NULL.
    return df.filter(
        F.col("_corrupt").isNull() & F.col("doc_id").isNotNull()
    ).select("doc_id", "text", "lang", "n_chars")
