"""Split from queries.py lines 20635-20862 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, F, register, t, tok_arr
from .q26_r8_mixed import _SRC_TC_CTES, _cms_cell

# ===========================================================================
# round-9 sketch / vocabulary-richness family
# ===========================================================================


def _cms_sk_sql(src: str) -> str:
    """One 4x512 CMS build in SQL over a (user_id, c) count table —
    the same sha2 cell family as _CMS_ORACLE, factored so the merge-
    equivalence oracle builds three sketches without drift."""
    return f"""(
      SELECT r.r,
             ('0x' || substr(sha256(CAST(u.user_id AS VARCHAR) || 'cms'
                                    || CAST(r.r AS VARCHAR)), 1, 8))::UBIGINT % 512
                 AS cell,
             CAST(SUM(u.c) AS BIGINT) AS total
      FROM {src} u CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS r) r
      GROUP BY 1, 2
    )"""


register(
    "sketch_cms_merge_equivalence",
    # THE property that makes a sketch distributed-safe: mergeability.
    # The event stream splits into two halves (parity of the floored
    # epoch second), a 4x512 CMS is built on each half, the merged
    # sketch (cell-wise sum) must equal the one-pass sketch over the
    # full stream CELL FOR CELL — counters are linear, so n_diff_cells
    # and max_abs_diff are exactly 0 per row. The same check HLL gets
    # from sketch_hll_mergeable_daily, applied to the CMS family.
    oracle=f"""
    WITH ev AS MATERIALIZED (
      SELECT user_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) % 2 = 0 AS half_a
      FROM events
    ),
    uca AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c FROM ev WHERE half_a GROUP BY user_id),
    ucb AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c FROM ev WHERE NOT half_a GROUP BY user_id),
    ucf AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c FROM ev GROUP BY user_id),
    ska AS {_cms_sk_sql("uca")},
    skb AS {_cms_sk_sql("ucb")},
    skd AS {_cms_sk_sql("ucf")},
    mg AS (
      SELECT COALESCE(a.r, b.r) AS r, COALESCE(a.cell, b.cell) AS cell,
             a.total AS ta, b.total AS tb
      FROM ska a FULL OUTER JOIN skb b ON a.r = b.r AND a.cell = b.cell
    ),
    cmp AS (
      SELECT COALESCE(m.r, d.r) AS r, m.ta, m.tb, d.total AS td
      FROM mg m FULL OUTER JOIN skd d ON d.r = m.r AND d.cell = m.cell
    )
    SELECT r,
           CAST(SUM(CASE WHEN ta IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS cells_a,
           CAST(SUM(CASE WHEN tb IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS cells_b,
           CAST(SUM(CASE WHEN ta IS NOT NULL OR tb IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS cells_merged,
           CAST(SUM(CASE WHEN td IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS cells_direct,
           CAST(SUM(COALESCE(ta, 0) + COALESCE(tb, 0)) AS BIGINT) AS mass_merged,
           CAST(SUM(COALESCE(td, 0)) AS BIGINT) AS mass_direct,
           CAST(SUM(CASE WHEN COALESCE(ta, 0) + COALESCE(tb, 0) <> COALESCE(td, 0)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_diff_cells,
           CAST(MAX(ABS(COALESCE(ta, 0) + COALESCE(tb, 0) - COALESCE(td, 0))) AS BIGINT)
               AS max_abs_diff
    FROM cmp GROUP BY r ORDER BY r
    """,
)


def _dcmsmerge(spark, sf_dir):
    """CMS merge == rebuild, verified cell-exactly: three sketch builds
    share one scan (the half flag is a map-side expression), each
    sketch is a fixed 2048-cell aggregate, and the comparison is two
    full-outer joins on (r, cell) — everything after the per-user count
    is bounded by the sketch width, which is what lets a 1000-executor
    cluster maintain per-partition sketches and merge at the end."""
    ev = (
        t(spark, sf_dir, "events")
        .select("user_id", (F.unix_timestamp("ts") % 2 == 0).alias("half_a"))
        .localCheckpoint(eager=False)
    )

    def _sk(uc):
        cells = uc.select(
            "user_id", "c", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("r")
        ).withColumn("cell", _cms_cell())
        return cells.groupBy("r", "cell").agg(F.sum("c").cast("long").alias("total"))

    def _uc(df):
        return df.groupBy("user_id").agg(F.count("*").cast("long").alias("c"))

    ska = _sk(_uc(ev.filter(F.col("half_a"))))
    skb = _sk(_uc(ev.filter(~F.col("half_a"))))
    skd = _sk(_uc(ev))
    mg = (
        ska.withColumnRenamed("total", "ta")
        .join(skb.withColumnRenamed("total", "tb"), ["r", "cell"], "full")
    )
    cmp = mg.join(skd.withColumnRenamed("total", "td"), ["r", "cell"], "full")
    msum = F.coalesce(F.col("ta"), F.lit(0)) + F.coalesce(F.col("tb"), F.lit(0))
    return (
        cmp.groupBy("r")
        .agg(
            F.sum(F.when(F.col("ta").isNotNull(), 1).otherwise(0)).cast("long").alias("cells_a"),
            F.sum(F.when(F.col("tb").isNotNull(), 1).otherwise(0)).cast("long").alias("cells_b"),
            F.sum(
                F.when(F.col("ta").isNotNull() | F.col("tb").isNotNull(), 1).otherwise(0)
            ).cast("long").alias("cells_merged"),
            F.sum(F.when(F.col("td").isNotNull(), 1).otherwise(0)).cast("long").alias("cells_direct"),
            F.sum(msum).cast("long").alias("mass_merged"),
            F.sum(F.coalesce(F.col("td"), F.lit(0))).cast("long").alias("mass_direct"),
            F.sum(
                F.when(msum != F.coalesce(F.col("td"), F.lit(0)), 1).otherwise(0)
            ).cast("long").alias("n_diff_cells"),
            F.max(F.abs(msum - F.coalesce(F.col("td"), F.lit(0)))).cast("long").alias("max_abs_diff"),
        )
        .orderBy("r")
    )


CATALOG["sketch_cms_merge_equivalence"].fn = _dcmsmerge


def _src_tc_frame(spark, sf_dir):
    """(source, tok, c): the Spark twin of _SRC_TC_CTES."""
    d = t(spark, sf_dir, "documents")
    tk = tok_arr(F.col("text"))
    return (
        d.select("source", F.explode(tk).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").cast("long").alias("c"))
    )


register(
    "doc_vocab_chao1_richness",
    # how much vocabulary has the corpus NOT seen yet? Chao1's
    # bias-corrected richness estimate per source: V + f1*(f1-1)/
    # (2*(f2+1)) from the singleton/doubleton counts — the standard
    # species-richness estimator applied to token types, an exact
    # rational (one IEEE division) over pure integer counts.
    oracle=f"""
    WITH {_SRC_TC_CTES}
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS v_obs,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
           CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
           round(COUNT(*)
                 + SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                   * CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) - 1 AS DOUBLE)
                   / (2 * (SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) + 1)), 6) AS chao1
    FROM tc GROUP BY source
    """,
)


def _dchao1(spark, sf_dir):
    """Chao1 vocabulary richness per source: one token-keyed count
    aggregate then one source-keyed rollup — the frequency-of-
    frequencies live entirely in the vocabulary-sized frame."""
    tc = _src_tc_frame(spark, sf_dir)
    f1 = F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
    f2 = F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
    return tc.groupBy("source").agg(
        F.count("*").cast("long").alias("v_obs"),
        f1.cast("long").alias("f1"),
        f2.cast("long").alias("f2"),
        F.round(
            F.count("*") + f1 * (f1 - 1).cast("double") / (2 * (f2 + 1)), 6
        ).alias("chao1"),
    )


CATALOG["doc_vocab_chao1_richness"].fn = _dchao1

register(
    "doc_token_simpson_diversity",
    # token-distribution concentration per source: Simpson's index
    # D = sum n_i(n_i-1) / (N(N-1)) (the probability two sampled tokens
    # are the same type) and its inverse (the "effective vocabulary
    # size") — both exact rationals over integer counts, the
    # concentration gauge next to the entropy-rate family.
    oracle=f"""
    WITH {_SRC_TC_CTES},
    s AS (
      SELECT source,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS v_obs,
             CAST(SUM(c * (c - 1)) AS BIGINT) AS same2
      FROM tc GROUP BY source
    )
    SELECT source, n_tokens, v_obs,
           round(CAST(same2 AS DOUBLE)
                 / (n_tokens * CAST(n_tokens - 1 AS DOUBLE)), 6) AS simpson,
           round(n_tokens * CAST(n_tokens - 1 AS DOUBLE)
                 / NULLIF(CAST(same2 AS DOUBLE), 0.0), 6) AS inv_simpson
    FROM s
    """,
)


def _dsimpson(spark, sf_dir):
    """Simpson token diversity per source: the same vocabulary-sized
    count frame as Chao1, one rollup, two IEEE divisions."""
    tc = _src_tc_frame(spark, sf_dir)
    s = tc.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("v_obs"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("same2"),
    )
    return s.select(
        "source",
        "n_tokens",
        "v_obs",
        F.round(
            F.col("same2").cast("double")
            / (F.col("n_tokens") * (F.col("n_tokens") - 1).cast("double")),
            6,
        ).alias("simpson"),
        F.round(
            F.col("n_tokens") * (F.col("n_tokens") - 1).cast("double")
            / F.nullif(F.col("same2").cast("double"), F.lit(0.0)),
            6,
        ).alias("inv_simpson"),
    )


CATALOG["doc_token_simpson_diversity"].fn = _dsimpson


