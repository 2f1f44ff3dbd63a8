"""Round-14 wave 10: hub closeness/eccentricity over the near-dup
graph (multi-seed labeled BFS, exact integer distances), a
matryoshka-style prefix-dimension recall sweep over the embedding
corpus, and three closed-form estimators the regression family lacked
— instrumental-variables 2SLS, the Oaxaca-Blinder two-fold gap
decomposition, and Deming (errors-in-variables, lambda = 1)
regression.

Scale shape: BFS frontiers are keyed joins over the banded dup-graph
edges (never all-pairs) with a bounded unroll; the matryoshka sweep is
a query-vector x corpus scan at four prefix widths (top-10 frames meet
through joins); the estimators are single grouped aggregates with
exact integer-cleared moments.  Exactness: distances/counts are pure
integers; cosine chains are the proven sim_bruteforce double idiom;
2SLS/Oaxaca/Deming clear denominators (n*Sxy - Sx*Sy) in
HUGEINT/decimal(38,0) before one final IEEE assembly.
"""

from __future__ import annotations

from ._registry import CATALOG, F, Window, dedup, register, t
from ..ops import similarity
from .q15_curation_r3 import _minhash_portable_oracle

_BFS_HOPS = 6
_BFS_SEEDS = 5


def _closeness_oracle() -> str:
    prev = "f0"
    iters = []
    for k in range(1, _BFS_HOPS + 1):
        iters.append(f""",
    f{k} AS MATERIALIZED (
      SELECT seed, node, CAST(MIN(dist) AS BIGINT) AS dist FROM (
        SELECT seed, node, dist FROM {prev}
        UNION ALL
        SELECT p.seed, e.dst AS node, p.dist + 1 AS dist
        FROM edges e JOIN {prev} p ON e.src = p.node
      ) GROUP BY seed, node
    )""")
        prev = f"f{k}"
    return f"""
    WITH pairs AS ({_minhash_portable_oracle()}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b, id_a FROM pairs
    ),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),
    f0 AS MATERIALIZED (
      SELECT node AS seed, node, CAST(0 AS BIGINT) AS dist
      FROM (SELECT node FROM deg ORDER BY deg DESC, node LIMIT {_BFS_SEEDS})
    )
    {"".join(iters)}
    SELECT seed,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_reached,
           CAST(SUM(dist) AS BIGINT) AS dist_sum,
           CAST(MAX(dist) AS BIGINT) AS eccentricity,
           round(CAST(COUNT(*) - 1 AS DOUBLE) / NULLIF(SUM(dist), 0), 9)
             AS closeness
    FROM {prev}
    GROUP BY seed ORDER BY seed
    """


register(
    "graph_closeness_ecc_hubs",
    # Closeness centrality and eccentricity of the 5 highest-degree
    # near-dup hubs: a multi-seed labeled BFS (seed, node, min-dist)
    # unrolled {hops} hops (the banded dup graph's components are
    # shallow; distances beyond the unroll would not change the hubs'
    # ranking at these densities and the bound is what makes the plan
    # scale-safe).  Exact integer distance sums; closeness =
    # (reached - 1) / sum(dist).
    oracle=_closeness_oracle(),
)


def _dcloseness(spark, sf_dir):
    """Multi-seed BFS with distance labels — one keyed join + min-agg
    per hop, frontiers checkpointed so plan depth stays constant."""
    d = t(spark, sf_dir, "documents")
    pairs = dedup.minhash_dup_pairs_portable(
        d, "doc_id", "text", num_perm=16, bands=4, jaccard_threshold=0.5
    ).select("id_a", "id_b")
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .localCheckpoint(eager=False)
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("deg"))
    seeds = (
        deg.orderBy(F.desc("deg"), "node")
        .limit(_BFS_SEEDS)
        .select(F.col("node").alias("seed"), F.col("node"), F.lit(0).cast("long").alias("dist"))
    )
    frontier = seeds.localCheckpoint(eager=True)
    for _ in range(_BFS_HOPS):
        expanded = (
            frontier.unionByName(
                edges.join(
                    frontier.withColumnRenamed("node", "src"), "src"
                ).select("seed", F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
            )
            .groupBy("seed", "node")
            .agg(F.min("dist").cast("long").alias("dist"))
        )
        frontier = expanded.localCheckpoint(eager=True)
    return (
        frontier.groupBy("seed")
        .agg(
            (F.count("*") - 1).cast("long").alias("n_reached"),
            F.sum("dist").cast("long").alias("dist_sum"),
            F.max("dist").cast("long").alias("eccentricity"),
            F.round(
                (F.count("*") - 1).cast("double")
                / F.nullif(F.sum("dist"), F.lit(0)),
                9,
            ).alias("closeness"),
        )
        .orderBy("seed")
    )


CATALOG["graph_closeness_ecc_hubs"].fn = _dcloseness


_MDIMS = (8, 16, 32)


def _matry_oracle() -> str:
    def dot_d(d):
        return (
            f"list_sum(list_transform(range(1, {d + 1}), "
            f"i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))"
        )

    def nrm_d(col, d):
        return (
            f"list_sum(list_transform(range(1, {d + 1}), "
            f"i -> CAST({col}.embedding[i] AS DOUBLE) * CAST({col}.embedding[i] AS DOUBLE)))"
        )

    tops = []
    for d in list(_MDIMS) + [64]:
        tops.append(f"""t{d} AS MATERIALIZED (
      SELECT e.vec_id FROM embeddings e, q
      ORDER BY {dot_d(d)} / (SQRT({nrm_d('e', d)}) * SQRT({nrm_d('q', d)})) DESC,
               e.vec_id
      LIMIT 10
    )""")
    unions = "\n      UNION ALL\n".join(
        f"""      SELECT {d} AS dim,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM t{d} JOIN t64 USING (vec_id))
               AS overlap10"""
        for d in _MDIMS
    )
    return f"""
    WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    {", ".join(tops)}
    SELECT dim, overlap10,
           round(overlap10 / 10.0, 6) AS recall_at_10
    FROM (
{unions}
    ) ORDER BY dim
    """


register(
    "emb_matryoshka_recall_sweep",
    # Matryoshka-representation audit: cosine top-10 using only the
    # first 8/16/32 dimensions vs the full-64 top-10 — recall@10 per
    # prefix width.  Each list is one query-vector x corpus scan (the
    # sim_bruteforce shape); the lists meet through 10-row joins.
    oracle=_matry_oracle(),
)


def _dmatryoshka(spark, sf_dir):
    """Prefix-dim recall sweep off four bounded top-10 frames."""
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).agg(F.first("embedding").alias("qv"))
    joined = e.crossJoin(F.broadcast(q)).localCheckpoint(eager=False)

    def top10(d):
        ed = F.slice(F.col("embedding"), 1, d)
        qd = F.slice(F.col("qv"), 1, d)
        return (
            joined.select(
                "vec_id", similarity.cosine(ed, qd).alias("c")
            )
            .orderBy(F.desc("c"), "vec_id")
            .limit(10)
            .select("vec_id")
        )

    full = top10(64)
    spark_ = e.sparkSession
    outs = []
    for d in _MDIMS:
        ov = top10(d).join(full, "vec_id").count()
        outs.append((d, ov, round(ov / 10.0, 6)))
    return spark_.createDataFrame(
        outs, "dim int, overlap10 long, recall_at_10 double"
    ).orderBy("dim")


CATALOG["emb_matryoshka_recall_sweep"].fn = _dmatryoshka


# Shared exact integer moments of (x = discount pct, y = quantity,
# z = tax pct) over lineitem.
_XYZ_CTE = """m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS HUGEINT) AS sx,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS sy,
             CAST(SUM(CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS HUGEINT) AS sz,
             SUM(CAST(CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS HUGEINT) * CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS sxx,
             SUM(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)
               * CAST(l_quantity AS BIGINT)) AS syy,
             SUM(CAST(CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT) AS HUGEINT)
               * CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT)) AS szz,
             SUM(CAST(CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS HUGEINT) * CAST(l_quantity AS BIGINT)) AS sxy,
             SUM(CAST(CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT) AS HUGEINT)
               * CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)) AS szx,
             SUM(CAST(CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT) AS HUGEINT)
               * CAST(l_quantity AS BIGINT)) AS szy
      FROM lineitem
    )"""


def _xyz_frame(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    x = (F.col("l_discount").cast("decimal(18,2)") * 100).cast("long")
    y = F.col("l_quantity").cast("long")
    z = (F.col("l_tax").cast("decimal(18,2)") * 100).cast("long")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    return li.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(x).cast("decimal(38,0)").alias("sx"),
        F.sum(y).cast("decimal(38,0)").alias("sy"),
        F.sum(z).cast("decimal(38,0)").alias("sz"),
        F.sum(dec(x) * x).alias("sxx"),
        F.sum(dec(y) * y).alias("syy"),
        F.sum(dec(z) * z).alias("szz"),
        F.sum(dec(x) * y).alias("sxy"),
        F.sum(dec(z) * x).alias("szx"),
        F.sum(dec(z) * y).alias("szy"),
    )


register(
    "ml_iv_2sls_discount_qty",
    # Instrumental-variables (2SLS, one regressor one instrument):
    # quantity ~ discount instrumented by tax.  beta_IV = (n*Szy -
    # Sz*Sy)/(n*Szx - Sz*Sx) — exact cleared covariances; reported
    # next to plain OLS and the first-stage F = (n-2)*r^2/(1-r^2)
    # with r^2 from the same exact moments.  (A mechanics fixture:
    # the point is the estimator algebra, not the economics.)
    oracle=f"""
    WITH {_XYZ_CTE},
    cv AS (
      SELECT n,
             CAST(n * szy - sz * sy AS DOUBLE) AS czy,
             CAST(n * szx - sz * sx AS DOUBLE) AS czx,
             CAST(n * sxy - sx * sy AS DOUBLE) AS cxy,
             CAST(n * sxx - sx * sx AS DOUBLE) AS cxx,
             CAST(n * szz - sz * sz AS DOUBLE) AS czz
      FROM m
    )
    SELECT n AS n_rows,
           round(czy / czx, 9) AS beta_iv,
           round(cxy / cxx, 9) AS beta_ols,
           round((n - 2) * (czx * czx / (czz * cxx))
                 / (1 - czx * czx / (czz * cxx)), 6) AS first_stage_f
    FROM cv
    """,
)


def _div2sls(spark, sf_dir):
    """2SLS from exact cleared moments."""
    m = _xyz_frame(spark, sf_dir)
    n = F.col("n")
    czy = (n * F.col("szy") - F.col("sz") * F.col("sy")).cast("double")
    czx = (n * F.col("szx") - F.col("sz") * F.col("sx")).cast("double")
    cxy = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    cxx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    czz = (n * F.col("szz") - F.col("sz") * F.col("sz")).cast("double")
    r2 = czx * czx / (czz * cxx)
    return m.select(
        n.alias("n_rows"),
        F.round(czy / czx, 9).alias("beta_iv"),
        F.round(cxy / cxx, 9).alias("beta_ols"),
        F.round((n - 2) * r2 / (1 - r2), 6).alias("first_stage_f"),
    )


CATALOG["ml_iv_2sls_discount_qty"].fn = _div2sls


register(
    "ml_oaxaca_blinder_rn",
    # Two-fold Oaxaca-Blinder decomposition of the R-vs-N quantity gap
    # with discount as the single covariate and N as the reference:
    # gap = ybar_R - ybar_N = explained (beta_N * (xbar_R - xbar_N)) +
    # unexplained.  Per-group slopes/means come from exact cleared
    # moments; the decomposition is one IEEE assembly.
    oracle="""
    WITH g AS (
      SELECT l_returnflag AS grp, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS HUGEINT) AS sx,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS sy,
             SUM(CAST(CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS HUGEINT) * CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
               AS BIGINT)) AS sxx,
             SUM(CAST(CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS HUGEINT) * CAST(l_quantity AS BIGINT)) AS sxy
      FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1
    ),
    b AS (
      SELECT grp, n,
             CAST(sx AS DOUBLE) / n AS xbar, CAST(sy AS DOUBLE) / n AS ybar,
             CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) AS beta
      FROM g
    ),
    w AS (
      SELECT MAX(CASE WHEN grp = 'R' THEN xbar END) AS xr,
             MAX(CASE WHEN grp = 'R' THEN ybar END) AS yr,
             MAX(CASE WHEN grp = 'R' THEN beta END) AS br,
             MAX(CASE WHEN grp = 'N' THEN xbar END) AS xn,
             MAX(CASE WHEN grp = 'N' THEN ybar END) AS yn,
             MAX(CASE WHEN grp = 'N' THEN beta END) AS bn
      FROM b
    )
    SELECT round(yr - yn, 9) AS total_gap,
           round(bn * (xr - xn), 9) AS explained,
           round((yr - yn) - bn * (xr - xn), 9) AS unexplained,
           round(br, 9) AS beta_r, round(bn, 9) AS beta_n
    FROM w
    """,
)


def _doaxaca(spark, sf_dir):
    """Oaxaca-Blinder two-fold off per-group exact moments."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag").isin("R", "N"))
    x = (F.col("l_discount").cast("decimal(18,2)") * 100).cast("long")
    y = F.col("l_quantity").cast("long")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    g = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(x).cast("decimal(38,0)").alias("sx"),
        F.sum(y).cast("decimal(38,0)").alias("sy"),
        F.sum(dec(x) * x).alias("sxx"),
        F.sum(dec(x) * y).alias("sxy"),
    )
    n = F.col("n")
    b = g.select(
        "grp",
        (F.col("sx").cast("double") / n).alias("xbar"),
        (F.col("sy").cast("double") / n).alias("ybar"),
        (
            (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        ).alias("beta"),
    )
    w = b.agg(
        F.max(F.when(F.col("grp") == "R", F.col("xbar"))).alias("xr"),
        F.max(F.when(F.col("grp") == "R", F.col("ybar"))).alias("yr"),
        F.max(F.when(F.col("grp") == "R", F.col("beta"))).alias("br"),
        F.max(F.when(F.col("grp") == "N", F.col("xbar"))).alias("xn"),
        F.max(F.when(F.col("grp") == "N", F.col("ybar"))).alias("yn"),
        F.max(F.when(F.col("grp") == "N", F.col("beta"))).alias("bn"),
    )
    return w.select(
        F.round(F.col("yr") - F.col("yn"), 9).alias("total_gap"),
        F.round(F.col("bn") * (F.col("xr") - F.col("xn")), 9).alias("explained"),
        F.round(
            (F.col("yr") - F.col("yn")) - F.col("bn") * (F.col("xr") - F.col("xn")), 9
        ).alias("unexplained"),
        F.round(F.col("br"), 9).alias("beta_r"),
        F.round(F.col("bn"), 9).alias("beta_n"),
    )


CATALOG["ml_oaxaca_blinder_rn"].fn = _doaxaca


register(
    "ml_deming_regression_dq",
    # Deming regression (errors in BOTH variables, lambda = 1) of
    # quantity on discount: beta = ((Syy - Sxx) + sqrt((Syy - Sxx)^2 +
    # 4*Sxy^2)) / (2*Sxy) on the cleared moment sums (the common n^2
    # factor cancels), intercept from the means — the measurement-
    # error-robust companion to OLS/Theil-Sen.  One sqrt.
    oracle=f"""
    WITH {_XYZ_CTE},
    s AS (
      SELECT n,
             CAST(n * sxx - sx * sx AS DOUBLE) AS sxx_c,
             CAST(n * syy - sy * sy AS DOUBLE) AS syy_c,
             CAST(n * sxy - sx * sy AS DOUBLE) AS sxy_c,
             CAST(sx AS DOUBLE) / n AS xbar, CAST(sy AS DOUBLE) / n AS ybar
      FROM m
    )
    SELECT n AS n_rows,
           round(((syy_c - sxx_c)
                  + sqrt((syy_c - sxx_c) * (syy_c - sxx_c)
                         + 4 * (sxy_c * sxy_c))) / (2 * sxy_c), 9)
             AS beta_deming,
           round(ybar - ((syy_c - sxx_c)
                  + sqrt((syy_c - sxx_c) * (syy_c - sxx_c)
                         + 4 * (sxy_c * sxy_c))) / (2 * sxy_c) * xbar, 9)
             AS alpha_deming,
           round(sxy_c / sxx_c, 9) AS beta_ols
    FROM s
    """,
)


def _ddeming(spark, sf_dir):
    """Deming (lambda = 1) from cleared exact moments."""
    m = _xyz_frame(spark, sf_dir)
    n = F.col("n")
    sxx_c = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    syy_c = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    sxy_c = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    xbar = F.col("sx").cast("double") / n
    ybar = F.col("sy").cast("double") / n
    beta = (
        (syy_c - sxx_c)
        + F.sqrt((syy_c - sxx_c) * (syy_c - sxx_c) + 4 * (sxy_c * sxy_c))
    ) / (2 * sxy_c)
    return m.select(
        n.alias("n_rows"),
        F.round(beta, 9).alias("beta_deming"),
        F.round(ybar - beta * xbar, 9).alias("alpha_deming"),
        F.round(sxy_c / sxx_c, 9).alias("beta_ols"),
    )


CATALOG["ml_deming_regression_dq"].fn = _ddeming
