"""Round-15 wave 5: ecological diversity estimators over the shared
(source, token, count) frame — the ACE (abundance-based coverage)
richness estimator (the rare-species sibling of the r8 Chao1), the
Miller-Madow bias-corrected Shannon entropy, Hill numbers q=0/1/2
(effective vocabulary sizes), and two cross-source community
similarity measures: Morisita-Horn and Bray-Curtis.

Exactness: every abundance moment is an exact integer; per-type
c*ln(c) terms quantize to micro-nats before the cross-type sums
(the house token-entropy idiom); Hill q1 = exp(H) follows the q25
perplexity precedent (engine exp on a deterministic double, rounded
6dp); Morisita-Horn clears to the pure-integer rational
2*Sxy*X*Y / (Sx2*Y^2 + Sy2*X^2) evaluated once in double; Bray-Curtis
is an exact integer rational.
"""

from __future__ import annotations

from ._registry import CATALOG, F, register
from .q26_r8_mixed import _SRC_TC_CTES
from .q28_r9_sketch_vocab import _src_tc_frame

register(
    "doc_vocab_ace_richness",
    # ACE with the standard rare cutoff 10: C_ace = 1 - F1/N_rare,
    # gamma^2 = max(S_rare * sum k(k-1)F_k / (C_ace N_r (N_r - 1)) - 1, 0),
    # ACE = S_abund + S_rare/C_ace + F1/C_ace * gamma^2.  All counts
    # integer; NULLIF guards the all-singleton degenerate.
    oracle=f"""
    WITH {_SRC_TC_CTES},
    s AS (
      SELECT source,
             CAST(SUM(CASE WHEN c > 10 THEN 1 ELSE 0 END) AS BIGINT) AS s_abund,
             CAST(SUM(CASE WHEN c <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS s_rare,
             CAST(SUM(CASE WHEN c <= 10 THEN c ELSE 0 END) AS BIGINT) AS n_rare,
             CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
             CAST(SUM(CASE WHEN c <= 10 THEN c * (c - 1) ELSE 0 END) AS BIGINT)
               AS sk2
      FROM tc GROUP BY source
    ),
    g AS (
      -- NULLIF every deniable denominator (Spark ANSI throws on /0,
      -- DuckDB yields inf — NULL is the one agreed value), and keep
      -- the gamma^2 clamp's NULL propagation EXPLICIT: engines
      -- disagree on GREATEST(NULL, 0)
      SELECT source, s_abund, s_rare, n_rare, f1,
             1 - CAST(f1 AS DOUBLE) / NULLIF(n_rare, 0) AS cace_raw,
             s_rare * CAST(sk2 AS DOUBLE)
               / NULLIF(CAST(n_rare AS DOUBLE) * (n_rare - 1), 0) AS g2num
      FROM s
    )
    SELECT source, s_abund, s_rare, n_rare, f1,
           round(s_abund
                 + s_rare / NULLIF(cace_raw, 0)
                 + f1 / NULLIF(cace_raw, 0)
                   * (CASE WHEN g2num IS NULL OR cace_raw IS NULL THEN NULL
                           WHEN g2num / NULLIF(cace_raw, 0) - 1 > 0
                             THEN g2num / NULLIF(cace_raw, 0) - 1
                           ELSE 0 END), 6) AS ace
    FROM g ORDER BY source
    """,
)


def _dace(spark, sf_dir):
    """ACE richness per source off the frequency-of-frequencies."""
    tc = _src_tc_frame(spark, sf_dir)
    s = tc.groupBy("source").agg(
        F.sum(F.when(F.col("c") > 10, 1).otherwise(0)).cast("long").alias("s_abund"),
        F.sum(F.when(F.col("c") <= 10, 1).otherwise(0)).cast("long").alias("s_rare"),
        F.sum(F.when(F.col("c") <= 10, F.col("c")).otherwise(0))
        .cast("long")
        .alias("n_rare"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long").alias("f1"),
        F.sum(F.when(F.col("c") <= 10, F.col("c") * (F.col("c") - 1)).otherwise(0))
        .cast("long")
        .alias("sk2"),
    )
    cace_raw = F.lit(1) - F.col("f1").cast("double") / F.nullif(
        F.col("n_rare"), F.lit(0)
    )
    g2num = (
        F.col("s_rare")
        * F.col("sk2").cast("double")
        / F.nullif(F.col("n_rare").cast("double") * (F.col("n_rare") - 1), F.lit(0.0))
    )
    g = s.select(
        "source",
        "s_abund",
        "s_rare",
        "n_rare",
        "f1",
        cace_raw.alias("cace_raw"),
        g2num.alias("g2num"),
    )
    cace = F.nullif(F.col("cace_raw"), F.lit(0.0))
    g2 = F.col("g2num") / cace - 1
    gamma2 = (
        F.when(F.col("g2num").isNull() | F.col("cace_raw").isNull(), F.lit(None))
        .when(g2 > 0, g2)
        .otherwise(F.lit(0.0))
    )
    return g.select(
        "source",
        "s_abund",
        "s_rare",
        "n_rare",
        "f1",
        F.round(
            F.col("s_abund") + F.col("s_rare") / cace + F.col("f1") / cace * gamma2, 6
        ).alias("ace"),
    ).orderBy("source")


CATALOG["doc_vocab_ace_richness"].fn = _dace


register(
    "doc_miller_madow_entropy_sources",
    # Plug-in Shannon entropy per source, H = ln N - (1/N) sum c ln c
    # (per-type micro-nat quantization), plus the Miller-Madow
    # bias-corrected H_MM = H + (V-1)/(2N).
    oracle=f"""
    WITH {_SRC_TC_CTES},
    s AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS v,
             CAST(SUM(c * CAST(floor(round(ln(CAST(c AS DOUBLE)), 6) * 1000000
                                     + 0.5) AS BIGINT)) AS HUGEINT) AS st6
      FROM tc GROUP BY source
    )
    SELECT source, n, v,
           round(round(ln(CAST(n AS DOUBLE)), 6)
                 - CAST(st6 AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6), 9) AS h_plugin,
           round(round(ln(CAST(n AS DOUBLE)), 6)
                 - CAST(st6 AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6)
                 + (v - 1) / (2.0 * n), 9) AS h_miller_madow
    FROM s ORDER BY source
    """,
)


def _dmillermadow(spark, sf_dir):
    """Miller-Madow corrected entropy per source."""
    tc = _src_tc_frame(spark, sf_dir)
    t6 = F.col("c") * F.floor(
        F.round(F.log(F.col("c").cast("double")), 6) * F.lit(1000000) + F.lit(0.5)
    ).cast("long")
    s = tc.groupBy("source").agg(
        F.sum("c").cast("long").alias("n"),
        F.count("*").cast("long").alias("v"),
        F.sum(t6).cast("decimal(38,0)").alias("st6"),
    )
    h = F.round(F.log(F.col("n").cast("double")), 6) - F.col("st6").cast("double") / (
        F.col("n").cast("double") * F.lit(1e6)
    )
    return s.select(
        "source",
        "n",
        "v",
        F.round(h, 9).alias("h_plugin"),
        F.round(h + (F.col("v") - 1) / (2.0 * F.col("n")), 9).alias("h_miller_madow"),
    ).orderBy("source")


CATALOG["doc_miller_madow_entropy_sources"].fn = _dmillermadow


register(
    "doc_hill_numbers_sources",
    # Hill numbers per source: q0 = V (richness), q1 = exp(H)
    # (Shannon effective types, the q25 exp precedent), q2 = N^2 /
    # sum c^2 (inverse-Simpson effective types, plug-in form), and
    # the evenness ratio q2/q1.
    oracle=f"""
    WITH {_SRC_TC_CTES},
    s AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS v,
             SUM(CAST(c AS HUGEINT) * c) AS sc2,
             CAST(SUM(c * CAST(floor(round(ln(CAST(c AS DOUBLE)), 6) * 1000000
                                     + 0.5) AS BIGINT)) AS HUGEINT) AS st6
      FROM tc GROUP BY source
    )
    SELECT source, n, v AS hill_q0,
           round(exp(round(ln(CAST(n AS DOUBLE)), 6)
                     - CAST(st6 AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6)), 6)
             AS hill_q1,
           round(CAST(n AS DOUBLE) * n / CAST(sc2 AS DOUBLE), 6) AS hill_q2,
           round((CAST(n AS DOUBLE) * n / CAST(sc2 AS DOUBLE))
                 / exp(round(ln(CAST(n AS DOUBLE)), 6)
                       - CAST(st6 AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6)), 9)
             AS evenness_q2_q1
    FROM s ORDER BY source
    """,
)


def _dhill(spark, sf_dir):
    """Hill q0/q1/q2 effective-type counts per source."""
    tc = _src_tc_frame(spark, sf_dir)
    t6 = F.col("c") * F.floor(
        F.round(F.log(F.col("c").cast("double")), 6) * F.lit(1000000) + F.lit(0.5)
    ).cast("long")
    s = tc.groupBy("source").agg(
        F.sum("c").cast("long").alias("n"),
        F.count("*").cast("long").alias("v"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("sc2"),
        F.sum(t6).cast("decimal(38,0)").alias("st6"),
    )
    h = F.round(F.log(F.col("n").cast("double")), 6) - F.col("st6").cast("double") / (
        F.col("n").cast("double") * F.lit(1e6)
    )
    q2 = F.col("n").cast("double") * F.col("n") / F.col("sc2").cast("double")
    return s.select(
        "source",
        "n",
        F.col("v").alias("hill_q0"),
        F.round(F.exp(h), 6).alias("hill_q1"),
        F.round(q2, 6).alias("hill_q2"),
        F.round(q2 / F.exp(h), 9).alias("evenness_q2_q1"),
    ).orderBy("source")


CATALOG["doc_hill_numbers_sources"].fn = _dhill


register(
    "doc_morisita_horn_sources",
    # Morisita-Horn similarity for every source pair — cleared to the
    # pure-integer rational 2*Sxy*X*Y / (Sx2*Y^2 + Sy2*X^2) (the
    # da+db denominator multiplied through), one double division.
    oracle=f"""
    WITH {_SRC_TC_CTES},
    tot AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS n,
             SUM(CAST(c AS HUGEINT) * c) AS sc2
      FROM tc GROUP BY source
    ),
    xy AS (
      SELECT a.source AS src_a, b.source AS src_b,
             SUM(CAST(a.c AS HUGEINT) * b.c) AS sxy,
             CAST(COUNT(*) AS BIGINT) AS shared_types
      FROM tc a JOIN tc b ON a.tok = b.tok AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT xy.src_a, xy.src_b, xy.shared_types,
           round(CAST(2 * xy.sxy * ta.n * tb.n AS DOUBLE)
                 / CAST(ta.sc2 * CAST(tb.n AS HUGEINT) * tb.n
                        + tb.sc2 * CAST(ta.n AS HUGEINT) * ta.n AS DOUBLE), 9)
             AS morisita_horn
    FROM xy JOIN tot ta ON xy.src_a = ta.source
            JOIN tot tb ON xy.src_b = tb.source
    ORDER BY src_a, src_b
    """,
)


def _dmorisita(spark, sf_dir):
    """Pairwise Morisita-Horn via one token-keyed self-equi-join."""
    tc = _src_tc_frame(spark, sf_dir).localCheckpoint(eager=False)
    d38 = "decimal(38,0)"
    tot = tc.groupBy("source").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c").cast(d38) * F.col("c")).alias("sc2"),
    )
    a = tc.select(F.col("source").alias("src_a"), "tok", F.col("c").alias("ca"))
    b = tc.select(F.col("source").alias("src_b"), "tok", F.col("c").alias("cb"))
    xy = (
        a.join(b, "tok")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(
            F.sum(F.col("ca").cast(d38) * F.col("cb")).alias("sxy"),
            F.count("*").cast("long").alias("shared_types"),
        )
    )
    ta = tot.select(
        F.col("source").alias("src_a"), F.col("n").alias("na"), F.col("sc2").alias("sa2")
    )
    tb = tot.select(
        F.col("source").alias("src_b"), F.col("n").alias("nb"), F.col("sc2").alias("sb2")
    )
    j = xy.join(F.broadcast(ta), "src_a").join(F.broadcast(tb), "src_b")
    num = (2 * F.col("sxy") * F.col("na") * F.col("nb")).cast("double")
    den = (
        F.col("sa2") * F.col("nb").cast(d38) * F.col("nb")
        + F.col("sb2") * F.col("na").cast(d38) * F.col("na")
    ).cast("double")
    return j.select(
        "src_a",
        "src_b",
        "shared_types",
        F.round(num / den, 9).alias("morisita_horn"),
    ).orderBy("src_a", "src_b")


CATALOG["doc_morisita_horn_sources"].fn = _dmorisita


register(
    "doc_bray_curtis_sources",
    # Bray-Curtis dissimilarity for every source pair: 1 - 2*sum
    # min(x,y) / (X+Y) — min is 0 off the shared support, so one
    # token-keyed inner join carries the whole numerator. Exact
    # integer rational.
    oracle=f"""
    WITH {_SRC_TC_CTES},
    tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM tc GROUP BY source),
    mn AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(SUM(LEAST(a.c, b.c)) AS BIGINT) AS smin
      FROM tc a JOIN tc b ON a.tok = b.tok AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT mn.src_a, mn.src_b, mn.smin AS shared_mass,
           round(1 - CAST(2 * mn.smin AS DOUBLE) / (ta.n + tb.n), 9)
             AS bray_curtis
    FROM mn JOIN tot ta ON mn.src_a = ta.source
            JOIN tot tb ON mn.src_b = tb.source
    ORDER BY src_a, src_b
    """,
)


def _dbraycurtis(spark, sf_dir):
    """Pairwise Bray-Curtis via the shared-support min sum."""
    tc = _src_tc_frame(spark, sf_dir).localCheckpoint(eager=False)
    tot = tc.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    a = tc.select(F.col("source").alias("src_a"), "tok", F.col("c").alias("ca"))
    b = tc.select(F.col("source").alias("src_b"), "tok", F.col("c").alias("cb"))
    mn = (
        a.join(b, "tok")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.sum(F.least("ca", "cb")).cast("long").alias("smin"))
    )
    ta = tot.select(F.col("source").alias("src_a"), F.col("n").alias("na"))
    tb = tot.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))
    j = mn.join(F.broadcast(ta), "src_a").join(F.broadcast(tb), "src_b")
    return j.select(
        "src_a",
        "src_b",
        F.col("smin").alias("shared_mass"),
        F.round(
            1 - (2 * F.col("smin")).cast("double") / (F.col("na") + F.col("nb")), 9
        ).alias("bray_curtis"),
    ).orderBy("src_a", "src_b")


CATALOG["doc_bray_curtis_sources"].fn = _dbraycurtis
