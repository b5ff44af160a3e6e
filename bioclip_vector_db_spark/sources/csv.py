"""CSV source — the third interchange format (after WebDataset tars and
JSONL), with the quoting semantics that actually bite at ingest time:
embedded commas, embedded double quotes, and embedded NEWLINES inside
quoted fields (the case that breaks naive line-splitting and requires
multiLine parsing).

Staging is driver-side fixture preparation (same content-addressed
atomic publish + stale-sibling reaping as the other staged sources); the
scan is the distributed `spark.read.csv` with an explicit schema. The
roundtrip gate appends three crafted quoting-stress rows to the staged
file AND to the oracle (as literals), so byte-exact parity proves the
quote/escape/multiline handling, not just the happy path.
"""

from __future__ import annotations

import csv as _csv
import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..plans.registry import register

CSV_SCHEMA = "doc_id long, text string, lang string, n_chars long"

#: Quoting-stress rows appended to the staged file and mirrored as oracle
#: literals: embedded comma, embedded double quote, embedded newline.
STRESS_ROWS = (
    (900001, "comma, separated, values", "en", 24),
    (900002, 'she said "hello" twice', "en", 22),
    (900003, "line one\nline two", "en", 17),
)


def read_csv(spark: SparkSession, path: str, glob: str = "*.csv") -> DataFrame:
    """Schema-enforced CSV scan with full quote handling (multiLine for
    quoted embedded newlines, doubled-quote escapes)."""
    return (
        spark.read.schema(CSV_SCHEMA)
        .option("header", "true")
        .option("multiLine", "true")
        .option("quote", '"')
        .option("escape", '"')
        .option("pathGlobFilter", glob)
        .csv(path)
    )


def _stage_document_csv(sf_dir: str, n_files: int = 2) -> str:
    """Write the documents fixture as CSV (doc_id % n routing, sorted
    within file) plus the quoting-stress rows in file 0."""
    import pyarrow.parquet as pq

    from ..streaming.staging import _publish_atomically, _reap_stale_gate_siblings

    src = os.path.join(sf_dir, "documents.parquet")
    stamp = hashlib.md5(
        (str(os.path.getmtime(src)) + str(os.path.getsize(src)) + str(n_files) + "v1").encode()
    ).hexdigest()
    out = os.path.join(tempfile.gettempdir(), f"bvds_csv_{stamp[:12]}")
    _reap_stale_gate_siblings("bvds_csv", keep=out)

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
        writers = []
        files = []
        for i in range(n_files):
            fh = open(os.path.join(tmp, f"part-{i}.csv"), "w", newline="")
            w = _csv.writer(fh, quoting=_csv.QUOTE_MINIMAL, doublequote=True)
            w.writerow(["doc_id", "text", "lang", "n_chars"])
            files.append(fh)
            writers.append(w)
        try:
            for doc_id, text, lang, n_chars in rows:
                writers[doc_id % n_files].writerow([doc_id, text, lang, n_chars])
            for r in STRESS_ROWS:
                writers[0].writerow(list(r))
        finally:
            for fh in files:
                fh.close()

    return _publish_atomically(build, out, stamp)


def _stress_literals_sql() -> str:
    parts = []
    for doc_id, text, lang, n_chars in STRESS_ROWS:
        lit = text.replace("'", "''").replace("\n", "' || chr(10) || '")
        parts.append(
            f"SELECT {doc_id}::BIGINT AS doc_id, '{lit}' AS text, "
            f"'{lang}' AS lang, {n_chars}::BIGINT AS n_chars"
        )
    return " UNION ALL ".join(parts)


@register(
    "csv_scan_roundtrip",
    oracle=f"""
SELECT doc_id, text, lang, n_chars FROM documents
UNION ALL
{_stress_literals_sql()}
""",
)
def q_csv_scan_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+ [Q]: the CSV interchange scan end-to-end — the documents
    fixture staged as headered CSV plus three quoting-stress rows
    (embedded comma, embedded doubled quote, embedded newline inside a
    quoted field, parsed in multiLine mode); the scan must reproduce the
    source table plus the stress literals byte-exactly."""
    staged = _stage_document_csv(sf_dir)
    return read_csv(spark, staged)
