"""Document-corpus ingestion from the formats crawl dumps actually
arrive in: parquet, JSONL (the de-facto interchange for text corpora),
and CSV.

Scale rules baked in:

- **Schema is always explicit** — ``inferSchema``/JSON sampling reads
  the data once just to guess types; at 100 TB that is a full extra
  pass. Callers pass a DDL string or get :data:`DOC_SCHEMA`.
- **Corrupt-record quarantine, not job death** — crawl dumps contain
  malformed lines; ``PERMISSIVE`` mode routes them to a
  ``_corrupt_record`` column that :func:`read_corpus` splits off, so one
  bad line in shard 40k doesn't kill a 6-hour ingest. The rejects count
  is the ingest audit.
- Compressed inputs (``.gz``/``.zst``) work transparently through the
  datasource codecs; gzip is NOT splittable (one task per file), so
  dumps should arrive as many shards — which crawls do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

#: canonical documents schema (matches the synthetic testdata tables)
DOC_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def read_corpus(
    spark: SparkSession,
    path: str | list[str],
    format: str = "parquet",
    schema: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Read a corpus dump; returns ``(docs, rejects)``.

    ``docs`` carries the schema columns; ``rejects`` the raw corrupt
    lines (empty for parquet, whose schema is in the footer). Formats:
    ``parquet`` | ``jsonl`` | ``csv``.
    """
    schema = schema or DOC_SCHEMA
    if format == "parquet":
        docs = spark.read.schema(schema).parquet(
            *(path if isinstance(path, list) else [path])
        )
        rejects = docs.sparkSession.createDataFrame([], "line string")
        return docs, rejects
    if format == "jsonl":
        raw = (
            spark.read.schema(schema + ", _corrupt_record string")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(path)
        )
    elif format == "csv":
        raw = (
            spark.read.schema(schema + ", _corrupt_record string")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .option("header", "true")
            .csv(path)
        )
    else:
        raise ValueError(f"unknown corpus format: {format!r}")
    # one cached pass feeds both splits (otherwise each filter re-reads)
    raw = raw.cache()
    docs = raw.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    rejects = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("line")
    )
    return docs, rejects
