"""Round-15 wave 25 (post-close): SQL-interface gate II + embedding
geometry — three more raw-SQL-surface entries through sql.py's
registered temp views (LATERAL VIEW explode tokenization, a RANGE
BETWEEN INTERVAL sliding calendar window, and the SQL-standard
UNPIVOT clause), plus two exact whole-corpus embedding-geometry
diagnostics: the participation-ratio effective dimension
(sum var)^2 / sum var^2 over the 64 per-dimension variances, and the
average pairwise dot-product anisotropy ((||S||^2 - sum||x||^2) /
(n(n-1))) with its centered-identity self-check (centered average
pairwise dot = -trace(cov)/(n-1), an algebraic identity).

Exactness: tokens are deterministic single-space splits with empties
filtered; calendar windows sum exact cents; embedding coordinates
micro-quantize (floor(x*1e6+0.5), the r9 idiom) so every norm /
variance / dot moment is an exact integer in decimal-38; per-dim
variances pico-quantize before the 64-term participation sums.
"""

from __future__ import annotations

from ._registry import CATALOG, F, register, t


register(
    "sql_interface_lateral_explode",
    # The SQL-first surface exercising generator functions: Spark's
    # LATERAL VIEW explode(split(...)) vs DuckDB's unnest(
    # string_split(...)) — per-source token and vocabulary counts
    # straight from raw SQL strings over the registered views.
    oracle="""
    WITH toks AS (
      SELECT source, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_vocab
    FROM toks WHERE tok <> ''
    GROUP BY source ORDER BY source
    """,
)


def _dsqllateral(spark, sf_dir):
    """LATERAL VIEW explode through the raw-SQL path."""
    from ..sql import sql as run_sql

    return run_sql(
        spark,
        sf_dir,
        """
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_vocab
        FROM documents
        LATERAL VIEW explode(split(lower(text), ' ')) x AS tok
        WHERE tok <> ''
        GROUP BY source ORDER BY source
        """,
    )


CATALOG["sql_interface_lateral_explode"].fn = _dsqllateral


register(
    "sql_interface_range_interval_window",
    # The SQL-first surface exercising RANGE frames with INTERVAL
    # bounds: the trailing-7-day revenue sum per order day — a
    # calendar-aware sliding window (gaps in the date axis handled by
    # RANGE, which ROWS frames would get wrong) in identical raw SQL
    # on both engines.
    oracle="""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS dy,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    )
    SELECT strftime(dy, '%Y-%m-%d') AS day_s,
           round(CAST(cents AS DOUBLE) / 100, 2) AS revenue,
           round(CAST(SUM(cents) OVER (
                   ORDER BY dy
                   RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
                 AS DOUBLE) / 100, 2) AS trailing_7d_revenue
    FROM d ORDER BY dy
    """,
)


def _dsqlrange(spark, sf_dir):
    """RANGE BETWEEN INTERVAL window through the raw-SQL path."""
    from ..sql import sql as run_sql

    return run_sql(
        spark,
        sf_dir,
        """
        WITH d AS (
          SELECT CAST(o_orderdate AS DATE) AS dy,
                 CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                               AS BIGINT)) AS BIGINT) AS cents
          FROM orders GROUP BY 1
        )
        SELECT date_format(dy, 'yyyy-MM-dd') AS day_s,
               round(CAST(cents AS DOUBLE) / 100, 2) AS revenue,
               round(CAST(SUM(cents) OVER (
                       ORDER BY dy
                       RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
                     AS DOUBLE) / 100, 2) AS trailing_7d_revenue
        FROM d ORDER BY dy
        """,
    )


CATALOG["sql_interface_range_interval_window"].fn = _dsqlrange


register(
    "sql_interface_unpivot",
    # The SQL-first surface exercising the SQL-standard UNPIVOT
    # clause: the per-year priority-mix wide frame folded back to
    # (year, priority, n) rows — identical UNPIVOT (n FOR metric IN
    # (...)) text on both engines.
    oracle="""
    WITH w AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
             CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                           THEN 1 ELSE 0 END) AS BIGINT) AS urgent,
             CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH'
                           THEN 1 ELSE 0 END) AS BIGINT) AS high,
             CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM'
                           THEN 1 ELSE 0 END) AS BIGINT) AS medium,
             CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
                           THEN 1 ELSE 0 END) AS BIGINT) AS unspecified,
             CAST(SUM(CASE WHEN o_orderpriority = '5-LOW'
                           THEN 1 ELSE 0 END) AS BIGINT) AS low
      FROM orders GROUP BY 1
    )
    SELECT yr, priority, CAST(n AS BIGINT) AS n
    FROM w UNPIVOT (n FOR priority IN (urgent, high, medium, unspecified, low))
    ORDER BY yr, priority
    """,
)


def _dsqlunpivot(spark, sf_dir):
    """SQL-standard UNPIVOT through the raw-SQL path."""
    from ..sql import sql as run_sql

    return run_sql(
        spark,
        sf_dir,
        """
        WITH w AS (
          SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
                 CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                               THEN 1 ELSE 0 END) AS BIGINT) AS urgent,
                 CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH'
                               THEN 1 ELSE 0 END) AS BIGINT) AS high,
                 CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM'
                               THEN 1 ELSE 0 END) AS BIGINT) AS medium,
                 CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
                               THEN 1 ELSE 0 END) AS BIGINT) AS unspecified,
                 CAST(SUM(CASE WHEN o_orderpriority = '5-LOW'
                               THEN 1 ELSE 0 END) AS BIGINT) AS low
          FROM orders GROUP BY 1
        )
        SELECT yr, priority, CAST(n AS BIGINT) AS n
        FROM w
        UNPIVOT (n FOR priority IN (urgent, high, medium, unspecified, low))
        ORDER BY yr, priority
        """,
    )


CATALOG["sql_interface_unpivot"].fn = _dsqlunpivot


# Per-dimension micro-quantized coordinate moments.
_DIM_MOMENTS_CTE = """dims AS MATERIALIZED (
      SELECT vec_id,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
               AS BIGINT) AS x6,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    ),
    dm AS (
      SELECT pos, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x6) AS BIGINT) AS s,
             CAST(SUM(CAST(x6 AS HUGEINT) * x6) AS HUGEINT) AS s2
      FROM dims GROUP BY pos
    )"""


def _dim_moments(spark, sf_dir):
    """(pos, n, sum x6, sum x6^2) per embedding dimension."""
    d38 = "decimal(38,0)"
    e = t(spark, sf_dir, "embeddings")
    dims = e.select(F.posexplode("embedding").alias("pos", "x")).select(
        "pos",
        F.floor(F.col("x").cast("double") * 1e6 + F.lit(0.5)).cast("long").alias(
            "x6"
        ),
    )
    return dims.groupBy("pos").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x6").cast("long").alias("s"),
        F.sum(F.col("x6").cast(d38) * F.col("x6")).alias("s2"),
    )


register(
    "emb_participation_ratio_dim",
    # The participation-ratio effective dimension of the embedding
    # cloud: PR = (sum_d var_d)^2 / sum_d var_d^2 over the 64
    # per-dimension variances — 64 when isotropic, 1 when one axis
    # owns everything, no eigendecomposition needed.  Per-dim
    # variances from exact micro-int moments, pico-quantized before
    # the two 64-term sums (an exact integer rational after that).
    oracle=f"""
    WITH {_DIM_MOMENTS_CTE},
    v AS (
      SELECT CAST(floor(CAST(n * s2 - CAST(s AS HUGEINT) * s AS DOUBLE)
                        / (CAST(n AS DOUBLE) * n) + 0.5) AS BIGINT) AS v12
      FROM dm
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nd,
             CAST(SUM(v12) AS HUGEINT) AS sv,
             CAST(SUM(CAST(v12 AS HUGEINT) * v12) AS HUGEINT) AS sv2
      FROM v
    )
    SELECT nd AS n_dims,
           round(CAST(sv AS DOUBLE) / 1e12, 9) AS total_variance,
           round(CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)
                 / CAST(sv2 AS DOUBLE), 6) AS participation_ratio,
           round(CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)
                 / CAST(sv2 AS DOUBLE) / nd, 9) AS pr_fraction
    FROM agg
    """,
)


def _dparticipation(spark, sf_dir):
    """PR effective dimension from pico-quantized per-dim variances."""
    d38 = "decimal(38,0)"
    dm = _dim_moments(spark, sf_dir)
    v = dm.select(
        F.floor(
            (F.col("n") * F.col("s2") - F.col("s").cast(d38) * F.col("s")).cast(
                "double"
            )
            / (F.col("n").cast("double") * F.col("n"))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("v12")
    )
    agg = v.agg(
        F.count("*").cast("long").alias("nd"),
        F.sum("v12").cast(d38).alias("sv"),
        F.sum(F.col("v12").cast(d38) * F.col("v12")).alias("sv2"),
    )
    pr = (
        F.col("sv").cast("double") * F.col("sv").cast("double")
        / F.col("sv2").cast("double")
    )
    return agg.select(
        F.col("nd").alias("n_dims"),
        F.round(F.col("sv").cast("double") / F.lit(1e12), 9).alias(
            "total_variance"
        ),
        F.round(pr, 6).alias("participation_ratio"),
        F.round(pr / F.col("nd"), 9).alias("pr_fraction"),
    )


CATALOG["emb_participation_ratio_dim"].fn = _dparticipation


register(
    "emb_anisotropy_dot_stats",
    # Average pairwise dot product of the embedding cloud WITHOUT any
    # pair scan: avg_{i!=j} <x_i, x_j> = (||S||^2 - sum_i ||x_i||^2)
    # / (n (n-1)) with S the coordinate-sum vector — all exact
    # integer micro moments.  Emits the raw and the mean-squared-norm
    # -normalized anisotropy plus the centered-identity self-check
    # (avg centered pairwise dot * (n-1) = -total variance, an
    # algebraic identity that must land on 0 gap).
    oracle=f"""
    WITH {_DIM_MOMENTS_CTE},
    agg AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             CAST(SUM(CAST(s AS HUGEINT) * s) AS HUGEINT) AS ss2,
             CAST(SUM(s2) AS HUGEINT) AS sn2
      FROM dm
    )
    SELECT n AS n_vectors,
           round((CAST(ss2 AS DOUBLE) - CAST(sn2 AS DOUBLE))
                 / (CAST(n AS DOUBLE) * (n - 1)) / 1e12, 9) AS avg_pair_dot,
           round(CAST(sn2 AS DOUBLE) / n / 1e12, 9) AS mean_sq_norm,
           round(((CAST(ss2 AS DOUBLE) - CAST(sn2 AS DOUBLE))
                  / (CAST(n AS DOUBLE) * (n - 1)))
                 / (CAST(sn2 AS DOUBLE) / n), 9) AS anisotropy_ratio,
           round(((CAST(ss2 AS DOUBLE) - CAST(sn2 AS DOUBLE))
                  / (CAST(n AS DOUBLE) * (n - 1))
                  - CAST(ss2 AS DOUBLE) / (CAST(n AS DOUBLE) * n)
                  + (CAST(sn2 AS DOUBLE) / n
                     - CAST(ss2 AS DOUBLE) / (CAST(n AS DOUBLE) * n))
                    / (n - 1)) / 1e12, 6)
             AS centered_identity_gap
    FROM agg
    """,
)


def _danisotropy(spark, sf_dir):
    """Pair-scan-free average dot product + anisotropy ratio."""
    d38 = "decimal(38,0)"
    dm = _dim_moments(spark, sf_dir)
    agg = dm.agg(
        F.max("n").cast("long").alias("n"),
        F.sum(F.col("s").cast(d38) * F.col("s")).alias("ss2"),
        F.sum("s2").alias("sn2"),
    )
    n = F.col("n")
    nd = n.cast("double")
    apd = (F.col("ss2").cast("double") - F.col("sn2").cast("double")) / (
        nd * (n - 1)
    )
    msn = F.col("sn2").cast("double") / n
    # identity: apd - ||S||^2/n^2 = -trace(cov_pop)/(n-1), i.e. the
    # gap below is algebraically zero.
    ss2d = F.col("ss2").cast("double")
    sn2d = F.col("sn2").cast("double")
    gap = (
        apd - ss2d / (nd * n) + (sn2d / n - ss2d / (nd * n)) / (n - 1)
    )
    return agg.select(
        n.alias("n_vectors"),
        F.round(apd / F.lit(1e12), 9).alias("avg_pair_dot"),
        F.round(msn / F.lit(1e12), 9).alias("mean_sq_norm"),
        F.round(apd / msn, 9).alias("anisotropy_ratio"),
        F.round(gap / F.lit(1e12), 6).alias("centered_identity_gap"),
    )


CATALOG["emb_anisotropy_dot_stats"].fn = _danisotropy
