"""Split from queries.py lines 4125-4179 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, F, Window, register, t, text

# ===========================================================================
# Pipeline-shaped query: document cleanse (validate -> dedup -> score)
# ===========================================================================

register(
    "pipeline_docs_cleanse",
    oracle="""
    WITH valid AS (
      SELECT * FROM documents
      WHERE text IS NOT NULL AND length(trim(text)) > 0 AND lang IS NOT NULL
    ), fp AS (
      SELECT *, sha256(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                           ' +', ' ', 'g'))) AS fingerprint
      FROM valid
    ), dedup AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn FROM fp
      ) WHERE rn = 1
    )
    SELECT doc_id, lang, source, fingerprint,
           CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
           CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) >= 60 THEN 'long'
                WHEN len(regexp_split_to_array(trim(text), '\\s+')) >= 30 THEN 'medium'
                ELSE 'short' END AS length_tier
    FROM dedup
    """,
)


def _pcleanse(spark, sf_dir):
    """The Silver-pipeline shape (P2 validate -> W1 dedup -> enrich ->
    M8 tier) applied to the documents corpus — one declarative plan,
    no intermediate actions."""
    d = t(spark, sf_dir, "documents")
    valid = d.filter(
        F.col("text").isNotNull() & (F.length(F.trim("text")) > 0) & F.col("lang").isNotNull()
    )
    fp = valid.withColumn("fingerprint", text.fingerprint(F.col("text")))
    # W1-style dedup keeping the LOWEST doc_id as representative
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    deduped = fp.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    toks = text.token_count(F.col("text")).cast("long")
    return deduped.select(
        "doc_id",
        "lang",
        "source",
        "fingerprint",
        toks.alias("n_tokens"),
        F.when(toks >= 60, "long").when(toks >= 30, "medium").otherwise("short").alias("length_tier"),
    )


CATALOG["pipeline_docs_cleanse"].fn = _pcleanse


