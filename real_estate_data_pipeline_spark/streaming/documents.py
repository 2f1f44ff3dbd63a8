"""Streaming ingestion for the training-data corpus: the batch
documents pipeline (validate -> fingerprint -> dedup -> score) as an
incremental Structured Streaming flow.

The reference has no streaming at all (SURVEY §2.13); this is the
engine-extension counterpart of ``queries.pipeline_docs_cleanse`` for a
corpus that arrives continuously. State stays bounded: dedup uses
``dropDuplicatesWithinWatermark`` keyed on the content fingerprint, so
a duplicate document arriving within the watermark horizon is dropped
no matter which micro-batch it lands in, and fingerprints older than
the horizon age out of the state store instead of accumulating forever
— the property that matters when the stream has seen 10^11 documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..ops import text

DOCUMENT_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ingested_at", T.TimestampType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def read_document_stream(spark: SparkSession, path: str) -> DataFrame:
    """JSONL file-source stream with an EXPLICIT schema (streaming
    sources cannot infer) and the corrupt-line escape hatch the batch
    reader uses (S1)."""
    return (
        spark.readStream.schema(DOCUMENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .json(path)
    )


def cleanse_document_stream(
    docs: DataFrame,
    ts_col: str = "ingested_at",
    watermark: str = "30 minutes",
    min_tokens: int = 1,
) -> DataFrame:
    """Validate -> fingerprint -> watermark-bounded exact dedup ->
    quality-score, all incrementally:

    - validation and fingerprinting are stateless projections (run
      map-side per micro-batch);
    - the ONLY stateful operator is the fingerprint dedup, whose state
      is one slim (fingerprint, ts) entry per surviving document within
      the watermark horizon;
    - quality features come AFTER the dedup so the state store never
      pays for rows a later filter would drop anyway — except
      validation, which runs first precisely so invalid rows never
      enter the state store either.
    """
    valid = docs.filter(
        F.col("text").isNotNull()
        & (F.length(F.trim("text")) > 0)
        & F.col("lang").isNotNull()
        & (text.token_count(F.col("text")) >= min_tokens)
    )
    fp = valid.withColumn("fingerprint", text.fingerprint(F.col("text")))
    deduped = fp.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["fingerprint"]
    )
    return deduped.select(
        "doc_id",
        ts_col,
        "lang",
        "source",
        "fingerprint",
        text.token_count(F.col("text")).cast("long").alias("n_tokens"),
        text.quality_score(F.col("text")).alias("quality_score"),
        text.lang_id(F.col("text")).alias("lang_pred"),
    )
