"""Split from queries.py lines 30476-30894 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, F, Window, register, t, text, tok_arr
from .q31_r9_wave2_rank_embed import _SPLIT_MELT_SQL, _split_melt

# ===========================================================================
# round-11 wave 4: the curation-analytics tier — G2 keyness per source,
# information-gain ratio over the shared split melt, PII density
# profiling, and ARI readability. The text-quality features a corpus
# audit adds after the basics (lang-ID, stopword density, token shapes)
# are in place.
# ===========================================================================

register(
    "doc_keyness_g2_by_source",
    # corpus keyness: which tokens are most OVERUSED by each source vs
    # the rest of the corpus, by the log-likelihood ratio G2 over the
    # full 2x2 table (token/other-tokens x source/rest). Every ln
    # argument is a ratio of exact wide integers rounded at 6dp, each
    # observed count multiplies its own rounded ln (fixed 4-term
    # expression), and the ranking key is the picount-quantized G2 —
    # so the top-3 keywords per source can never drift by a float.
    oracle="""
    WITH tk AS (
      SELECT source,
             unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                x -> x <> '')) AS tok
      FROM documents
    ),
    cells AS MATERIALIZED (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS a FROM tk GROUP BY 1, 2
    ),
    na AS MATERIALIZED (
      SELECT source, CAST(SUM(a) AS BIGINT) AS na FROM cells GROUP BY 1
    ),
    ct AS MATERIALIZED (
      SELECT tok, CAST(SUM(a) AS BIGINT) AS ctot FROM cells GROUP BY 1
    ),
    nn AS (SELECT CAST(SUM(a) AS BIGINT) AS n FROM cells),
    sc AS (
      SELECT c.source, c.tok, c.a, ct.ctot - c.a AS b,
             na.na - c.a AS cc, (nn.n - na.na) - (ct.ctot - c.a) AS dd,
             na.na, nn.n - na.na AS nb, ct.ctot AS t1, nn.n - ct.ctot AS t0, nn.n
      FROM cells c JOIN na USING (source) JOIN ct USING (tok) CROSS JOIN nn
    ),
    g AS (
      SELECT source, tok, a, b, na, nb,
             CAST(floor(round(2.0 * (
               a * round(ln(CAST(CAST(a AS HUGEINT) * n AS DOUBLE)
                            / (CAST(CAST(t1 AS HUGEINT) * na AS DOUBLE))), 6)
               + CASE WHEN b = 0 THEN 0.0 ELSE
                   b * round(ln(CAST(CAST(b AS HUGEINT) * n AS DOUBLE)
                                / (CAST(CAST(t1 AS HUGEINT) * nb AS DOUBLE))), 6) END
               + CASE WHEN cc = 0 THEN 0.0 ELSE
                   cc * round(ln(CAST(CAST(cc AS HUGEINT) * n AS DOUBLE)
                                 / (CAST(CAST(t0 AS HUGEINT) * na AS DOUBLE))), 6) END
               + CASE WHEN dd = 0 THEN 0.0 ELSE
                   dd * round(ln(CAST(CAST(dd AS HUGEINT) * n AS DOUBLE)
                                 / (CAST(CAST(t0 AS HUGEINT) * nb AS DOUBLE))), 6) END
             ), 6) * 1000000 + 0.5) AS BIGINT) AS g12
      FROM sc
    ),
    r AS (
      SELECT source, tok, a, b, g12,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY g12 DESC, tok) AS rnk
      FROM g WHERE CAST(a AS HUGEINT) * (na + nb) > CAST(a + b AS HUGEINT) * na
    )
    SELECT source, tok AS token, a AS n_source, b AS n_rest,
           round(g12 / 1000000.0, 6) AS g2, CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= 3 ORDER BY source, rnk
    """,
)


def _dkeyness(spark, sf_dir):
    """G2 keyness: one tokenize pass, the (source, token) cell frame
    feeds its own marginals, the 4-term G2 is a projection over the
    cell join, and the per-source top-3 is a source-partitioned rank.
    The overuse filter (a*N > (a+b)*Na, i.e. relative frequency above
    the corpus rate) keeps the ranking on keywords, not gaps."""
    d = t(spark, sf_dir, "documents")
    tk = d.select("source", F.explode(tok_arr(F.col("text"))).alias("tok"))
    cells = (
        tk.groupBy("source", "tok")
        .agg(F.count("*").cast("long").alias("a"))
        .localCheckpoint(eager=False)
    )
    na = cells.groupBy("source").agg(F.sum("a").cast("long").alias("na")).localCheckpoint(
        eager=False
    )
    ct = cells.groupBy("tok").agg(F.sum("a").cast("long").alias("ctot"))
    nn = cells.agg(F.sum("a").cast("long").alias("n"))
    d19 = "decimal(19,0)"
    sc = (
        cells.join(F.broadcast(na), "source")
        .join(ct, "tok")
        .crossJoin(F.broadcast(nn))
        .select(
            "source",
            "tok",
            "a",
            (F.col("ctot") - F.col("a")).alias("b"),
            (F.col("na") - F.col("a")).alias("cc"),
            ((F.col("n") - F.col("na")) - (F.col("ctot") - F.col("a"))).alias("dd"),
            "na",
            (F.col("n") - F.col("na")).alias("nb"),
            F.col("ctot").alias("t1"),
            (F.col("n") - F.col("ctot")).alias("t0"),
            "n",
        )
    )

    def lnterm(o, tnum, tden):
        return F.when(o == 0, F.lit(0.0)).otherwise(
            o
            * F.round(
                F.log(
                    (o.cast(d19) * F.col("n")).cast("double")
                    / (F.col(tnum).cast(d19) * F.col(tden)).cast("double")
                ),
                6,
            )
        )

    g2x = 2.0 * (
        lnterm(F.col("a"), "t1", "na")
        + lnterm(F.col("b"), "t1", "nb")
        + lnterm(F.col("cc"), "t0", "na")
        + lnterm(F.col("dd"), "t0", "nb")
    )
    g = sc.select(
        "source",
        "tok",
        "a",
        "b",
        "na",
        "nb",
        F.floor(F.round(g2x, 6) * 1e6 + 0.5).cast("long").alias("g12"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("g12"), "tok")
    r = (
        g.filter(
            F.col("a").cast(d19) * (F.col("na") + F.col("nb"))
            > (F.col("a") + F.col("b")).cast(d19) * F.col("na")
        )
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
    )
    return r.select(
        "source",
        F.col("tok").alias("token"),
        F.col("a").alias("n_source"),
        F.col("b").alias("n_rest"),
        F.round(F.col("g12") / 1e6, 6).alias("g2"),
        "rnk",
    ).orderBy("source", "rnk")


CATALOG["doc_keyness_g2_by_source"].fn = _dkeyness

register(
    "ml_info_gain_ratio_features",
    # the entropy twin of the Gini split ranking, over the SAME shared
    # 3-feature melt: information gain H(class) - H(class|feature),
    # split information (the intrinsic value that penalizes
    # high-cardinality features), and Quinlan's gain ratio. Every
    # entropy term is (count/N) * ln(exact ratio) quantized to
    # picounits before its cross-group sum — the C4.5 feature scorer
    # with zero order-dependent float accumulation.
    oracle=f"""
    WITH {_SPLIT_MELT_SQL},
    fvc AS MATERIALIZED (
      SELECT feature, val, flag, CAST(COUNT(*) AS BIGINT) AS c
      FROM x GROUP BY 1, 2, 3
    ),
    fv AS MATERIALIZED (
      SELECT feature, val, CAST(SUM(c) AS BIGINT) AS nv FROM fvc GROUP BY 1, 2
    ),
    nn AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n FROM fvc WHERE feature = 'linestatus'
    ),
    hclass AS (
      SELECT CAST(SUM(CAST(floor(round((CAST(cc AS DOUBLE) / nn.n)
               * round(ln(CAST(nn.n AS DOUBLE) / cc), 6), 12)
               * 1000000000000 + 0.5) AS BIGINT)) AS BIGINT) AS h12
      FROM (SELECT flag, CAST(SUM(c) AS BIGINT) AS cc
            FROM fvc WHERE feature = 'linestatus' GROUP BY flag) CROSS JOIN nn
    ),
    hcond AS (
      SELECT feature,
             CAST(SUM(CAST(floor(round((CAST(fvc.c AS DOUBLE) / nn.n)
               * round(ln(CAST(fv.nv AS DOUBLE) / fvc.c), 6), 12)
               * 1000000000000 + 0.5) AS BIGINT)) AS BIGINT) AS hc12
      FROM fvc JOIN fv USING (feature, val) CROSS JOIN nn
      GROUP BY feature
    ),
    iv AS (
      SELECT feature, CAST(COUNT(*) AS BIGINT) AS n_values,
             CAST(SUM(CAST(floor(round((CAST(nv AS DOUBLE) / nn.n)
               * round(ln(CAST(nn.n AS DOUBLE) / nv), 6), 12)
               * 1000000000000 + 0.5) AS BIGINT)) AS BIGINT) AS iv12
      FROM fv CROSS JOIN nn GROUP BY feature
    )
    SELECT hcond.feature, iv.n_values,
           round(hclass.h12 / 1000000000000.0, 6) AS h_class,
           round(hcond.hc12 / 1000000000000.0, 6) AS h_conditional,
           round((hclass.h12 - hcond.hc12) / 1000000000000.0, 6) AS info_gain,
           round(iv.iv12 / 1000000000000.0, 6) AS split_info,
           round(CAST(hclass.h12 - hcond.hc12 AS DOUBLE) / iv.iv12, 6) AS gain_ratio
    FROM hcond JOIN iv USING (feature) CROSS JOIN hclass
    ORDER BY gain_ratio DESC, feature
    """,
)


def _dgainratio(spark, sf_dir):
    """Gain ratio over the shared melt: one (feature, value, class)
    count pass, marginals from the cell frame, three picounit entropy
    aggregates, a 3-row result. The C4.5 ranking next to the CART
    ranking, from the SAME featurization."""
    li = t(spark, sf_dir, "lineitem")
    x = _split_melt(li)
    fvc = x.groupBy("feature", "val", "flag").agg(
        F.count("*").cast("long").alias("c")
    ).localCheckpoint(eager=False)
    fv = fvc.groupBy("feature", "val").agg(
        F.sum("c").cast("long").alias("nv")
    ).localCheckpoint(eager=False)
    nn = fvc.filter(F.col("feature") == "linestatus").agg(
        F.sum("c").cast("long").alias("n")
    )

    def pico(share_num, ln_num, ln_den):
        return F.floor(
            F.round(
                (share_num.cast("double") / F.col("n"))
                * F.round(F.log(ln_num.cast("double") / ln_den), 6),
                12,
            )
            * 1e12
            + 0.5
        ).cast("long")

    hclass = (
        fvc.filter(F.col("feature") == "linestatus")
        .groupBy("flag")
        .agg(F.sum("c").cast("long").alias("cc"))
        .crossJoin(F.broadcast(nn))
        .agg(F.sum(pico(F.col("cc"), F.col("n"), F.col("cc"))).cast("long").alias("h12"))
    )
    hcond = (
        fvc.join(fv, ["feature", "val"])
        .crossJoin(F.broadcast(nn))
        .groupBy("feature")
        .agg(F.sum(pico(F.col("c"), F.col("nv"), F.col("c"))).cast("long").alias("hc12"))
    )
    iv = (
        fv.crossJoin(F.broadcast(nn))
        .groupBy("feature")
        .agg(
            F.count("*").cast("long").alias("n_values"),
            F.sum(pico(F.col("nv"), F.col("n"), F.col("nv"))).cast("long").alias("iv12"),
        )
    )
    return (
        hcond.join(iv, "feature")
        .crossJoin(F.broadcast(hclass))
        .select(
            "feature",
            "n_values",
            F.round(F.col("h12") / 1e12, 6).alias("h_class"),
            F.round(F.col("hc12") / 1e12, 6).alias("h_conditional"),
            F.round((F.col("h12") - F.col("hc12")) / 1e12, 6).alias("info_gain"),
            F.round(F.col("iv12") / 1e12, 6).alias("split_info"),
            F.round(
                (F.col("h12") - F.col("hc12")).cast("double") / F.col("iv12"), 6
            ).alias("gain_ratio"),
        )
        .orderBy(F.desc("gain_ratio"), "feature")
    )


CATALOG["ml_info_gain_ratio_features"].fn = _dgainratio

# Density-scorer class names keyed off the redactor's own placeholder
# tokens (ops/text.py PII_PATTERNS) so the scorer and the scrubber can
# never drift: an edit to the redactor's regexes flows through here.
_PII_CLASS_NAMES = {"<URL>": "urls", "<EMAIL>": "emails", "<IP>": "ips", "<PHONE>": "phones"}
_PII_PATTERNS = tuple((_PII_CLASS_NAMES[tok], pat) for pat, tok in text.PII_PATTERNS)
if len(_PII_PATTERNS) != len(_PII_CLASS_NAMES):
    raise ValueError("ops/text.PII_PATTERNS diverged from the density-scorer class map")

register(
    "doc_pii_density_by_source",
    # which sources need the scrubber most: per-source match counts of
    # the four PII classes (the SAME patterns doc_pii_redact replaces,
    # counted independently on the raw text) per 1000 tokens. Counts
    # are exact integers from the shared RE2-compatible regexes; the
    # densities are single divisions.
    oracle=f"""
    WITH d AS MATERIALIZED (
      SELECT source,
             len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                             x -> x <> '')) AS n_toks,
             {", ".join(f"len(regexp_extract_all(text, '{pat}')) AS {name}"
                        for name, pat in _PII_PATTERNS)}
      FROM documents WHERE text IS NOT NULL
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
           {", ".join(f"CAST(SUM({name}) AS BIGINT) AS n_{name}" for name, _ in _PII_PATTERNS)},
           {", ".join(f"round(1000.0 * SUM({name}) / NULLIF(SUM(n_toks), 0), 6)"
                      f" AS {name}_per_1k"
                      for name, _ in _PII_PATTERNS)}
    FROM d GROUP BY source ORDER BY source
    """,
)


def _dpiidensity(spark, sf_dir):
    """PII density: one projection computes token count + the four
    regexp_count columns per doc (all JVM-side), one rollup per
    source — the scrub-priority dashboard at scan cost. Patterns are
    the doc_pii_redact set, single-sourced in _PII_PATTERNS."""
    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    proj = d.select(
        "source",
        F.size(tok_arr(F.col("text"))).cast("long").alias("n_toks"),
        *[
            F.regexp_count(F.col("text"), F.lit(pat)).cast("long").alias(name)
            for name, pat in _PII_PATTERNS
        ],
    )
    return (
        proj.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
            *[F.sum(name).cast("long").alias(f"n_{name}") for name, _ in _PII_PATTERNS],
            *[
                F.round(
                    1000.0 * F.sum(name) / F.nullif(F.sum("n_toks"), F.lit(0)), 6
                ).alias(f"{name}_per_1k")
                for name, _ in _PII_PATTERNS
            ],
        )
        .orderBy("source")
    )


CATALOG["doc_pii_density_by_source"].fn = _dpiidensity

register(
    "doc_readability_ari_by_source",
    # Automated Readability Index per source: 4.71*(chars/word) +
    # 0.5*(words/sentence) - 21.43, from three exact integer masses —
    # token-character sums (over the shared tokenizer's tokens),
    # token counts, and sentence-punctuation runs floored at 1 per
    # doc. The grade-level proxy every curation filter bins on,
    # with nothing but integer sums crossing row boundaries.
    oracle="""
    WITH d AS (
      SELECT source,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks,
             GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS sents
      FROM documents WHERE text IS NOT NULL
    ),
    m AS (
      SELECT source, len(toks) AS n_words,
             CAST(list_sum(list_transform(toks, x -> len(x))) AS BIGINT) AS n_chars_tok,
             sents
      FROM d
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM(n_chars_tok) AS BIGINT) AS n_chars,
           CAST(SUM(sents) AS BIGINT) AS n_sentences,
           round(4.71 * SUM(n_chars_tok) / SUM(n_words)
                 + 0.5 * SUM(n_words) / SUM(sents) - 21.43, 6) AS ari
    FROM m GROUP BY source ORDER BY source
    """,
)


def _dreadability(spark, sf_dir):
    """ARI per source: per-doc token mass via one JVM aggregate over
    the shared tokenizer's array, sentence runs via one regexp_count,
    then a single rollup — readability grading at scan cost."""
    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = tok_arr(F.col("text"))
    m = d.select(
        "source",
        F.size(toks).cast("long").alias("n_words"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("n_chars_tok"),
        F.greatest(
            F.regexp_count(F.col("text"), F.lit(r"[.!?]+")).cast("long"), F.lit(1)
        ).alias("sents"),
    )
    return (
        m.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_chars_tok").cast("long").alias("n_chars"),
            F.sum("sents").cast("long").alias("n_sentences"),
            F.round(
                4.71 * F.sum("n_chars_tok") / F.sum("n_words")
                + 0.5 * F.sum("n_words") / F.sum("sents")
                - 21.43,
                6,
            ).alias("ari"),
        )
        .orderBy("source")
    )


CATALOG["doc_readability_ari_by_source"].fn = _dreadability


