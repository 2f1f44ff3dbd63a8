"""Round-13 wave 9: a kernel two-sample test and nominal/ordinal
structure summaries — the RBF maximum-mean-discrepancy between the R
and N quantity samples (kernel values pinned as integer nano-units),
Goodman-Kruskal lambda for the brand x size table, Pielou's evenness of
the per-language token distribution, the runs-up-and-down randomness
test on the daily series, and percentile-spread ratios of customer
revenue.

The MMD kernel k(d) = exp(-d^2/100) is evaluated ONCE in Python for
the 50 possible |differences| and quantized at 9 decimals into integer
nano-units, so all three kernel means are exact integer folds over the
bounded 50x50 grid; ln follows the 9-decimal convention elsewhere.
"""

from __future__ import annotations

import math

from ._registry import CATALOG, DEC, F, Window, register, t, tok_arr
from .q59_r13_trend_changepoint import _DAILY_CENTS_CTE, _daily_cents

# RBF kernel at sigma^2 = 50 on the integer quantity support, in
# nano-units: k9(d) = round(exp(-d^2/100) * 1e9), quantized once here.
_K9 = [(d, round(math.exp(-d * d / 100.0) * 1e9)) for d in range(50)]
_K9_SQL = ", ".join(f"({d}, {v})" for d, v in _K9)


register(
    "ml_mmd_rbf_quantity",
    # Biased-statistic RBF maximum mean discrepancy between the R and
    # N quantity samples: MMD^2 = E[k(x,x')] + E[k(y,y')] - 2E[k(x,y)]
    # with k(d) = exp(-d^2/100) pinned as a 50-row nano-unit table.
    # Each expectation is one exact HUGEINT fold of histogram-weight
    # products against the kernel table over the bounded 50x50 grid —
    # the modern kernel two-sample test without a sample pair join.
    oracle=f"""
    WITH vc AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cr,
             CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS cn
      FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(cr) AS BIGINT) AS nr, CAST(SUM(cn) AS BIGINT) AS nn
            FROM vc),
    kt AS (SELECT * FROM (VALUES {_K9_SQL}) AS v(d, k9)),
    grid AS (
      SELECT CAST(SUM(CAST(a.cr AS HUGEINT) * b.cr * kt.k9) AS DOUBLE) AS kxx,
             CAST(SUM(CAST(a.cn AS HUGEINT) * b.cn * kt.k9) AS DOUBLE) AS kyy,
             CAST(SUM(CAST(a.cr AS HUGEINT) * b.cn * kt.k9) AS DOUBLE) AS kxy
      FROM vc a CROSS JOIN vc b
      JOIN kt ON kt.d = ABS(a.q - b.q)
    )
    SELECT tot.nr AS n_r, tot.nn AS n_n,
           round(grid.kxx / (1e9 * CAST(tot.nr AS DOUBLE) * tot.nr)
                 + grid.kyy / (1e9 * CAST(tot.nn AS DOUBLE) * tot.nn)
                 - 2.0 * grid.kxy / (1e9 * CAST(tot.nr AS DOUBLE) * tot.nn), 9)
             AS mmd2,
           round(grid.kxy / (1e9 * CAST(tot.nr AS DOUBLE) * tot.nn), 6)
             AS mean_cross_kernel
    FROM tot CROSS JOIN grid
    """,
)


def _dmmdrbf(spark, sf_dir):
    """MMD-RBF: one two-class histogram, a 50-row pinned kernel table,
    three exact folds over the bounded value grid, one assembly row."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag").isin("R", "N"))
    vc = (
        li.groupBy(F.col("l_quantity").cast("long").alias("q"))
        .agg(
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("long")
            .alias("cr"),
            F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0))
            .cast("long")
            .alias("cn"),
        )
        .localCheckpoint(eager=False)
    )
    tot = vc.agg(
        F.sum("cr").cast("long").alias("nr"), F.sum("cn").cast("long").alias("nn")
    )
    kt = spark.createDataFrame(_K9, "d LONG, k9 LONG")
    a = vc.select(F.col("q").alias("aq"), F.col("cr").alias("acr"), F.col("cn").alias("acn"))
    b = vc.select(F.col("q").alias("bq"), F.col("cr").alias("bcr"), F.col("cn").alias("bcn"))
    grid = (
        a.crossJoin(F.broadcast(b))
        .join(F.broadcast(kt), F.col("d") == F.abs(F.col("aq") - F.col("bq")))
        .agg(
            F.sum(F.col("acr").cast("decimal(38,0)") * F.col("bcr") * F.col("k9"))
            .cast("double")
            .alias("kxx"),
            F.sum(F.col("acn").cast("decimal(38,0)") * F.col("bcn") * F.col("k9"))
            .cast("double")
            .alias("kyy"),
            F.sum(F.col("acr").cast("decimal(38,0)") * F.col("bcn") * F.col("k9"))
            .cast("double")
            .alias("kxy"),
        )
    )
    nrd = F.col("nr").cast("double")
    nnd = F.col("nn").cast("double")
    return tot.crossJoin(F.broadcast(grid)).select(
        F.col("nr").alias("n_r"),
        F.col("nn").alias("n_n"),
        F.round(
            F.col("kxx") / (F.lit(1e9) * nrd * F.col("nr"))
            + F.col("kyy") / (F.lit(1e9) * nnd * F.col("nn"))
            - 2.0 * F.col("kxy") / (F.lit(1e9) * nrd * F.col("nn")),
            9,
        ).alias("mmd2"),
        F.round(F.col("kxy") / (F.lit(1e9) * nrd * F.col("nn")), 6).alias(
            "mean_cross_kernel"
        ),
    )


CATALOG["ml_mmd_rbf_quantity"].fn = _dmmdrbf


register(
    "ml_gk_lambda_brand_size",
    # Goodman-Kruskal lambda for the p_brand x p_size table — the
    # proportional-reduction-in-error measure for nominal prediction,
    # both directions: lambda(size|brand) = (sum_b max_s n_bs -
    # max_s n_.s) / (n - max_s n_.s), and the transpose.  Every term
    # is an exact integer count; two closing divisions.
    oracle="""
    WITH cells AS (
      SELECT p_brand AS b, p_size AS s, CAST(COUNT(*) AS BIGINT) AS o
      FROM part GROUP BY 1, 2
    ),
    rowmax AS (SELECT b, CAST(MAX(o) AS BIGINT) AS mx FROM cells GROUP BY b),
    colmax AS (SELECT s, CAST(MAX(o) AS BIGINT) AS mx FROM cells GROUP BY s),
    marg AS (
      SELECT CAST(SUM(o) AS BIGINT) AS n,
             (SELECT CAST(MAX(cs) AS BIGINT)
              FROM (SELECT SUM(o) AS cs FROM cells GROUP BY s)) AS maxcol,
             (SELECT CAST(MAX(rs) AS BIGINT)
              FROM (SELECT SUM(o) AS rs FROM cells GROUP BY b)) AS maxrow
      FROM cells
    )
    SELECT marg.n AS n_rows,
           round((CAST((SELECT SUM(mx) FROM rowmax) AS DOUBLE) - marg.maxcol)
                 / (marg.n - marg.maxcol), 6) AS lambda_size_given_brand,
           round((CAST((SELECT SUM(mx) FROM colmax) AS DOUBLE) - marg.maxrow)
                 / (marg.n - marg.maxrow), 6) AS lambda_brand_given_size
    FROM marg
    """,
)


def _dgklambda(spark, sf_dir):
    """GK lambda: one cell aggregate, per-row/per-column max frames,
    exact integer PRE arithmetic — nominal predictability at GROUP-BY
    cost."""
    pa = t(spark, sf_dir, "part")
    cells = (
        pa.groupBy(F.col("p_brand").alias("b"), F.col("p_size").alias("s"))
        .agg(F.count("*").cast("long").alias("o"))
        .localCheckpoint(eager=False)
    )
    rowmax = cells.groupBy("b").agg(F.max("o").cast("long").alias("mx")).agg(
        F.sum("mx").cast("long").alias("srm")
    )
    colmax = cells.groupBy("s").agg(F.max("o").cast("long").alias("mx")).agg(
        F.sum("mx").cast("long").alias("scm")
    )
    marg = cells.agg(F.sum("o").cast("long").alias("n"))
    maxcol = (
        cells.groupBy("s")
        .agg(F.sum("o").cast("long").alias("cs"))
        .agg(F.max("cs").cast("long").alias("maxcol"))
    )
    maxrow = (
        cells.groupBy("b")
        .agg(F.sum("o").cast("long").alias("rs"))
        .agg(F.max("rs").cast("long").alias("maxrow"))
    )
    j = (
        marg.crossJoin(F.broadcast(rowmax))
        .crossJoin(F.broadcast(colmax))
        .crossJoin(F.broadcast(maxcol))
        .crossJoin(F.broadcast(maxrow))
    )
    return j.select(
        F.col("n").alias("n_rows"),
        F.round(
            (F.col("srm").cast("double") - F.col("maxcol"))
            / (F.col("n") - F.col("maxcol")),
            6,
        ).alias("lambda_size_given_brand"),
        F.round(
            (F.col("scm").cast("double") - F.col("maxrow"))
            / (F.col("n") - F.col("maxrow")),
            6,
        ).alias("lambda_brand_given_size"),
    )


CATALOG["ml_gk_lambda_brand_size"].fn = _dgklambda


register(
    "doc_pielou_evenness_by_lang",
    # Pielou's evenness per language: J = H / ln(V), the Shannon
    # entropy of the token-type distribution normalized by its maximum.
    # H uses the exact decomposition H = ln(N) - (1/N) sum c*ln(c)
    # with per-type ln(c) at the 9-decimal micro-nat convention; J = 1
    # means perfectly even type usage, small J a head-heavy vocabulary.
    oracle="""
    WITH tok AS (
      SELECT lang, unnest(list_filter(
               regexp_split_to_array(lower(trim(text)), '\\s+'),
               x -> x != '')) AS w
      FROM documents
    ),
    tf AS (
      SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY lang, w
    ),
    agg AS (
      SELECT lang, CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v,
             CAST(SUM(c * CAST(round(round(ln(CAST(c AS DOUBLE)), 9) * 1000000)
                               AS BIGINT)) AS BIGINT) AS clsum
      FROM tf GROUP BY lang
    )
    SELECT lang, n AS n_tokens, v AS vocab,
           round(round(ln(CAST(n AS DOUBLE)), 9)
                 - CAST(clsum AS DOUBLE) / (1000000.0 * n), 6) AS shannon_h,
           round((round(ln(CAST(n AS DOUBLE)), 9)
                  - CAST(clsum AS DOUBLE) / (1000000.0 * n))
                 / round(ln(CAST(v AS DOUBLE)), 9), 6) AS pielou_j
    FROM agg ORDER BY lang
    """,
)


def _dpielou(spark, sf_dir):
    """Pielou J: ONE tokenize pass, a (lang, type) count table, exact
    micro-nat entropy per language, one normalization."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("lang", F.explode(tok_arr(F.col("text"))).alias("w"))
    tf = tok.groupBy("lang", "w").agg(F.count("*").cast("long").alias("c"))
    agg = tf.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n"),
        F.count("*").cast("long").alias("v"),
        F.sum(
            F.col("c")
            * F.round(F.round(F.log(F.col("c").cast("double")), 9) * 1000000).cast(
                "long"
            )
        )
        .cast("long")
        .alias("clsum"),
    )
    h = F.round(F.log(F.col("n").cast("double")), 9) - F.col("clsum").cast(
        "double"
    ) / (1000000.0 * F.col("n"))
    return agg.select(
        "lang",
        F.col("n").alias("n_tokens"),
        F.col("v").alias("vocab"),
        F.round(h, 6).alias("shannon_h"),
        F.round(h / F.round(F.log(F.col("v").cast("double")), 9), 6).alias("pielou_j"),
    ).orderBy("lang")


CATALOG["doc_pielou_evenness_by_lang"].fn = _dpielou


register(
    "evt_runs_up_down_daily",
    # Runs-up-and-down randomness test on the daily value series: R =
    # 1 + number of sign changes among the nonzero successive
    # differences; under H0, E[R] = (2n-1)/3 and Var[R] = (16n-29)/90
    # with n the effective series length (nonzero steps + 1).  All
    # counts exact; one closing studentization.
    oracle=f"""
    WITH {_DAILY_CENTS_CTE},
    st AS (
      SELECT k,
             CASE WHEN cents > LAG(cents) OVER (ORDER BY k) THEN 1
                  WHEN cents < LAG(cents) OVER (ORDER BY k) THEN -1
                  ELSE 0 END AS sg
      FROM d QUALIFY sg IS NOT NULL AND sg != 0
    ),
    ch AS (
      SELECT sg, LAG(sg) OVER (ORDER BY k) AS prev
      FROM st
    ),
    agg AS (
      SELECT CAST(COUNT(*) + 1 AS BIGINT) AS n,
             CAST(1 + SUM(CASE WHEN prev IS NOT NULL AND sg != prev THEN 1
                               ELSE 0 END) AS BIGINT) AS r
      FROM ch
    )
    SELECT n AS n_eff, r AS n_runs,
           round((2.0 * n - 1) / 3.0, 6) AS expected_runs,
           round((r - (2.0 * n - 1) / 3.0)
                 / sqrt((16.0 * n - 29) / 90.0), 6) AS z_stat
    FROM agg
    """,
)


def _drunsupdown(spark, sf_dir):
    """Runs up/down: one lag window over the 30-row day frame, one
    sign-change fold, a closing studentization — the monotone-pattern
    companion of the above/below-median runs test."""
    d = _daily_cents(spark, sf_dir)
    st = (
        d.select(
            "k",
            F.when(F.col("cents") > F.lag("cents").over(Window.orderBy("k")), 1)
            .when(F.col("cents") < F.lag("cents").over(Window.orderBy("k")), -1)
            .otherwise(0)
            .alias("sg"),
        )
        .filter(F.col("sg").isNotNull() & (F.col("sg") != 0))
    )
    ch = st.select("sg", F.lag("sg").over(Window.orderBy("k")).alias("prev"))
    agg = ch.agg(
        (F.count("*") + 1).cast("long").alias("n"),
        (
            1
            + F.sum(
                F.when(
                    F.col("prev").isNotNull() & (F.col("sg") != F.col("prev")), 1
                ).otherwise(0)
            )
        )
        .cast("long")
        .alias("r"),
    )
    nd = F.col("n").cast("double")
    e = (2.0 * nd - 1) / 3.0
    return agg.select(
        F.col("n").alias("n_eff"),
        F.col("r").alias("n_runs"),
        F.round(e, 6).alias("expected_runs"),
        F.round((F.col("r") - e) / F.sqrt((16.0 * nd - 29) / 90.0), 6).alias("z_stat"),
    )


CATALOG["evt_runs_up_down_daily"].fn = _drunsupdown


register(
    "cust_percentile_ratio_spread",
    # Percentile-spread ratios of per-customer order revenue: P90/P10
    # and P75/P25, with the percentiles as exact type-1 order
    # statistics (smallest value whose rank reaches ceil(q*n)) off the
    # ranked per-customer frame — the inequality summary that, unlike
    # the Gini, localizes WHERE the spread lives.
    oracle="""
    WITH cr AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    rk AS (
      SELECT cents, ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS r,
             COUNT(*) OVER () AS n
      FROM cr
    ),
    qs AS (
      SELECT MAX(n) AS n,
             MIN(CASE WHEN 10 * r >= n THEN cents END) AS p10,
             MIN(CASE WHEN 4 * r >= n THEN cents END) AS p25,
             MIN(CASE WHEN 4 * r >= 3 * n THEN cents END) AS p75,
             MIN(CASE WHEN 10 * r >= 9 * n THEN cents END) AS p90
      FROM rk
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           CAST(p10 AS BIGINT) AS p10_cents, CAST(p90 AS BIGINT) AS p90_cents,
           round(CAST(p90 AS DOUBLE) / p10, 6) AS p90_p10_ratio,
           round(CAST(p75 AS DOUBLE) / p25, 6) AS p75_p25_ratio
    FROM qs
    """,
)


def _dpctratio(spark, sf_dir):
    """Percentile ratios: one per-customer aggregate, one ranked
    window, four exact integer rank thresholds, two divisions."""
    o = t(spark, sf_dir, "orders")
    cr = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents")
    )
    word = Window.orderBy("cents", "o_custkey")
    wall = word.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    rk = cr.select(
        "cents",
        F.row_number().over(word).alias("r"),
        F.count("*").over(wall).alias("n"),
    )
    qs = rk.agg(
        F.max("n").alias("n"),
        F.min(F.when(10 * F.col("r") >= F.col("n"), F.col("cents"))).alias("p10"),
        F.min(F.when(4 * F.col("r") >= F.col("n"), F.col("cents"))).alias("p25"),
        F.min(F.when(4 * F.col("r") >= 3 * F.col("n"), F.col("cents"))).alias("p75"),
        F.min(F.when(10 * F.col("r") >= 9 * F.col("n"), F.col("cents"))).alias("p90"),
    )
    return qs.select(
        F.col("n").cast("long").alias("n_customers"),
        F.col("p10").cast("long").alias("p10_cents"),
        F.col("p90").cast("long").alias("p90_cents"),
        F.round(F.col("p90").cast("double") / F.col("p10"), 6).alias("p90_p10_ratio"),
        F.round(F.col("p75").cast("double") / F.col("p25"), 6).alias("p75_p25_ratio"),
    )


CATALOG["cust_percentile_ratio_spread"].fn = _dpctratio
