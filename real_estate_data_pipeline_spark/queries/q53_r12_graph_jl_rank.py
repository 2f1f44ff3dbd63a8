"""Split from queries.py lines 34541-35066 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, dedup, register, t
from .q15_curation_r3 import _minhash_portable_oracle
from .q19_r7_graph import _DUP_EDGE_CTE, _dup_degrees, _dup_pairs_edges

# ===========================================================================
# Round-12 wave 6: graph-structure curves, the JL projection audit, and
# three exact rank/rate statistics. Graph queries ride the shared
# near-dup graph (_dup_pairs_edges / _DUP_EDGE_CTE) like the rest of the
# graph family; the JL audit rides the micro-quantized embedding idiom.
# ===========================================================================

register(
    "graph_avg_neighbor_degree_curve",
    # the assortativity CURVE knn(k) the single assortativity
    # coefficient summarizes away: mean neighbor degree per degree
    # class of the near-dup graph. Per-node neighbor-degree means are
    # exact rationals micro-quantized before the per-class integer
    # sum; a falling curve = hubs attach to leaves (template families
    # around a boilerplate core), a flat one = degree-neutral mixing.
    oracle=f"""
    WITH pairs AS ({_minhash_portable_oracle()}),
    {_DUP_EDGE_CTE},
    nbr AS (
      SELECT e.s AS node, da.deg AS mydeg, db.deg AS nbrdeg
      FROM edges e
      JOIN deg da ON da.node = e.s
      JOIN deg db ON db.node = e.d
    ),
    pernode AS (
      SELECT node, MAX(mydeg) AS deg,
             CAST(floor(CAST(SUM(nbrdeg) AS DOUBLE) / COUNT(*) * 1000000 + 0.5)
                  AS BIGINT) AS and6
      FROM nbr GROUP BY node
    )
    SELECT deg AS degree, CAST(COUNT(*) AS BIGINT) AS n_nodes,
           round(CAST(SUM(and6) AS BIGINT) / 1000000.0 / COUNT(*), 6) AS knn_mean
    FROM pernode GROUP BY deg ORDER BY deg
    """,
)


def _dknncurve(spark, sf_dir):
    """knn(k) curve: degree table joined onto both edge endpoints,
    one per-node mean, one per-degree-class rollup."""
    _, edges = _dup_pairs_edges(spark, sf_dir)
    deg = _dup_degrees(edges)
    da = deg.withColumnsRenamed({"node": "s", "deg": "mydeg"})
    db = deg.withColumnsRenamed({"node": "d", "deg": "nbrdeg"})
    nbr = edges.join(da, "s").join(db, "d").select(
        F.col("s").alias("node"), "mydeg", "nbrdeg"
    )
    pernode = nbr.groupBy("node").agg(
        F.max("mydeg").alias("deg"),
        F.floor(F.sum("nbrdeg").cast("double") / F.count("*") * 1000000 + 0.5)
        .cast("long")
        .alias("and6"),
    )
    return (
        pernode.groupBy(F.col("deg").alias("degree"))
        .agg(
            F.count("*").cast("long").alias("n_nodes"),
            F.round(F.sum("and6").cast("long") / 1000000.0 / F.count("*"), 6).alias("knn_mean"),
        )
        .orderBy("degree")
    )


CATALOG["graph_avg_neighbor_degree_curve"].fn = _dknncurve


register(
    "graph_preferential_attachment_pred",
    # does raw hub mass predict near-dup edges? The preferential-
    # attachment score deg(a)*deg(b) contrasted between actual edges
    # (jaccard_est >= 0.5) and the band-collision near-misses the LSH
    # surfaced but rejected — the degree-only baseline every smarter
    # link predictor (CN, AA, Jaccard) must beat. All integer
    # arithmetic until the closing means.
    oracle=f"""
    WITH cand AS MATERIALIZED ({_minhash_portable_oracle(thr=0.0)}),
    pairs AS MATERIALIZED (
      SELECT id_a, id_b FROM cand WHERE jaccard_est >= 0.5
    ),
    {_DUP_EDGE_CTE},
    ev AS (
      SELECT id_a, id_b,
             CASE WHEN jaccard_est >= 0.5 THEN 'edge' ELSE 'non_edge' END AS side
      FROM cand
    ),
    pa AS (
      SELECT e.side,
             COALESCE(da.deg, 0) * COALESCE(db.deg, 0) AS pa
      FROM ev e
      LEFT JOIN deg da ON da.node = e.id_a
      LEFT JOIN deg db ON db.node = e.id_b
    )
    SELECT side, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(CAST(SUM(pa) AS BIGINT) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_pa,
           round(CAST(SUM(CASE WHEN pa > 0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS share_with_signal
    FROM pa GROUP BY side ORDER BY side
    """,
)


def _dprefattach(spark, sf_dir):
    """PA baseline eval: one candidate pipeline at threshold 0 feeds
    both the edge set (>= 0.5) and the contrast set (< 0.5); degrees
    join on via two id-keyed broadcast-friendly equi-joins."""
    d = t(spark, sf_dir, "documents")
    cand = (
        dedup.minhash_dup_pairs_portable(
            d, "doc_id", "text", num_perm=16, bands=4, jaccard_threshold=0.0
        )
        .select("id_a", "id_b", "jaccard_est")
        .localCheckpoint(eager=False)
    )
    pairs = cand.filter(F.col("jaccard_est") >= 0.5).select("id_a", "id_b")
    edges = pairs.select(F.col("id_a").alias("s"), F.col("id_b").alias("d")).unionByName(
        pairs.select(F.col("id_b").alias("s"), F.col("id_a").alias("d"))
    )
    deg = _dup_degrees(edges)
    ev = cand.select(
        "id_a",
        "id_b",
        F.when(F.col("jaccard_est") >= 0.5, "edge").otherwise("non_edge").alias("side"),
    )
    da = deg.withColumnsRenamed({"node": "id_a", "deg": "dga"})
    db = deg.withColumnsRenamed({"node": "id_b", "deg": "dgb"})
    pa = (
        ev.join(da, "id_a", "left")
        .join(db, "id_b", "left")
        .select(
            "side",
            (F.coalesce(F.col("dga"), F.lit(0)) * F.coalesce(F.col("dgb"), F.lit(0))).alias("pa"),
        )
    )
    return (
        pa.groupBy("side")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(F.sum("pa").cast("long") / F.count("*").cast("double"), 6).alias("mean_pa"),
            F.round(
                F.sum(F.when(F.col("pa") > 0, 1).otherwise(0)).cast("double") / F.count("*"), 6
            ).alias("share_with_signal"),
        )
        .orderBy("side")
    )


CATALOG["graph_preferential_attachment_pred"].fn = _dprefattach


register(
    "emb_jl_distortion_audit",
    # the Johnson-Lindenstrauss promise, measured: project the 64-dim
    # embeddings to 8 dims with a pinned +-1 sign matrix (sign =
    # parity of sha256(proj_dim) — deterministic in both engines) and
    # audit the pair-distance ratio |R(x-y)|^2/8 over |x-y|^2 on the
    # consecutive-id pair sample. Elements micro-quantize first, so
    # projections, distances and ratios are exact until the closing
    # statistics.
    oracle="""
    WITH el AS MATERIALIZED (
      SELECT vec_id, g.i AS pos,
             CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS xm
      FROM embeddings, (SELECT unnest(range(1, 65)) AS i) g
    ),
    sgn AS MATERIALIZED (
      SELECT j.j, p.pos,
             CASE WHEN ('0x' || substr(sha256(CAST(j.j AS VARCHAR) || '_'
                                        || CAST(p.pos AS VARCHAR)), 1, 8))::UBIGINT % 2 = 0
                  THEN 1 ELSE -1 END AS sg
      FROM (SELECT unnest(range(1, 9)) AS j) j
      CROSS JOIN (SELECT unnest(range(1, 65)) AS pos) p
    ),
    proj AS MATERIALIZED (
      SELECT el.vec_id, s.j, CAST(SUM(s.sg * el.xm) AS BIGINT) AS ym
      FROM el JOIN sgn s ON s.pos = el.pos
      GROUP BY el.vec_id, s.j
    ),
    dorig AS (
      SELECT a.vec_id AS id_a,
             CAST(SUM(CAST(a.xm - b.xm AS HUGEINT) * (a.xm - b.xm)) AS BIGINT) AS do2
      FROM el a JOIN el b ON b.vec_id = a.vec_id + 1 AND b.pos = a.pos
      GROUP BY a.vec_id
    ),
    dproj AS (
      SELECT a.vec_id AS id_a,
             CAST(SUM(CAST(a.ym - b.ym AS HUGEINT) * (a.ym - b.ym)) AS BIGINT) AS dp2
      FROM proj a JOIN proj b ON b.vec_id = a.vec_id + 1 AND b.j = a.j
      GROUP BY a.vec_id
    ),
    rt AS (
      SELECT CAST(floor(CAST(dp2 AS DOUBLE) / 8.0 / do2 * 1000000 + 0.5) AS BIGINT) AS r6
      FROM dorig JOIN dproj USING (id_a) WHERE do2 > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(CAST(SUM(r6) AS BIGINT) / 1000000.0 / COUNT(*), 6) AS mean_ratio,
           round(MIN(r6) / 1000000.0, 6) AS min_ratio,
           round(MAX(r6) / 1000000.0, 6) AS max_ratio,
           round(CAST(SUM(CASE WHEN r6 >= 500000 AND r6 <= 2000000 THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS share_within_2x
    FROM rt
    """,
)


def _djldistortion(spark, sf_dir):
    """JL distortion audit: one 64x element fan-out, an 8-projection
    sign join (512-row broadcast), consecutive-id pair distances in
    exact integer space, one summary row."""
    e = t(spark, sf_dir, "embeddings")
    d19 = "decimal(19,0)"
    el = e.select(
        "vec_id", F.posexplode("embedding").alias("p", "x")
    ).select(
        "vec_id",
        (F.col("p") + 1).cast("long").alias("pos"),
        F.floor(F.col("x").cast("double") * 1000000 + F.lit(0.5)).cast("long").alias("xm"),
    ).localCheckpoint(eager=False)
    sgn = (
        spark.range(1, 9)
        .select(F.col("id").alias("j"))
        .crossJoin(spark.range(1, 65).select(F.col("id").alias("pos")))
        .select(
            "j",
            "pos",
            F.when(
                F.conv(
                    F.substring(
                        F.sha2(
                            F.concat(
                                F.col("j").cast("string"), F.lit("_"), F.col("pos").cast("string")
                            ),
                            256,
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 2
                == 0,
                1,
            )
            .otherwise(-1)
            .alias("sg"),
        )
    )
    proj = (
        el.join(F.broadcast(sgn), "pos")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("sg") * F.col("xm")).cast("long").alias("ym"))
        .localCheckpoint(eager=False)
    )
    ela = el.select(F.col("vec_id").alias("id_a"), "pos", F.col("xm").alias("xa"))
    elb = el.select((F.col("vec_id") - 1).alias("id_a"), "pos", F.col("xm").alias("xb"))
    dorig = (
        ela.join(elb, ["id_a", "pos"])
        .groupBy("id_a")
        .agg(
            F.sum((F.col("xa") - F.col("xb")).cast(d19) * (F.col("xa") - F.col("xb")).cast(d19))
            .cast("long")
            .alias("do2")
        )
    )
    pra = proj.select(F.col("vec_id").alias("id_a"), "j", F.col("ym").alias("ya"))
    prb = proj.select((F.col("vec_id") - 1).alias("id_a"), "j", F.col("ym").alias("yb"))
    dproj = (
        pra.join(prb, ["id_a", "j"])
        .groupBy("id_a")
        .agg(
            F.sum((F.col("ya") - F.col("yb")).cast(d19) * (F.col("ya") - F.col("yb")).cast(d19))
            .cast("long")
            .alias("dp2")
        )
    )
    rt = (
        dorig.join(dproj, "id_a")
        .filter(F.col("do2") > 0)
        .select(
            F.floor(F.col("dp2").cast("double") / 8.0 / F.col("do2") * 1000000 + 0.5)
            .cast("long")
            .alias("r6")
        )
    )
    return rt.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.round(F.sum("r6").cast("long") / 1000000.0 / F.count("*"), 6).alias("mean_ratio"),
        F.round(F.min("r6") / 1000000.0, 6).alias("min_ratio"),
        F.round(F.max("r6") / 1000000.0, 6).alias("max_ratio"),
        F.round(
            F.sum(F.when((F.col("r6") >= 500000) & (F.col("r6") <= 2000000), 1).otherwise(0))
            .cast("double")
            / F.count("*"),
            6,
        ).alias("share_within_2x"),
    )


CATALOG["emb_jl_distortion_audit"].fn = _djldistortion


register(
    "ml_kendall_tau_b_daily",
    # Kendall's tau-b (tie-corrected) between daily order volume and
    # daily revenue, over the calendar-day pair join (pairs grow with
    # wall-clock span squared, never with row count — the seasonal-MK
    # lesson). Concordant/discordant/tie counts are exact integers;
    # tau-b is one fixed expression with IEEE sqrt.
    oracle="""
    WITH d AS MATERIALIZED (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    p AS (
      SELECT CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END AS conc,
             CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END AS disc,
             CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
             CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
      FROM d a JOIN d b ON a.day < b.day
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n0,
             CAST(SUM(conc) AS BIGINT) AS c, CAST(SUM(disc) AS BIGINT) AS dd,
             CAST(SUM(tx) AS BIGINT) AS n1, CAST(SUM(ty) AS BIGINT) AS n2
      FROM p
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM d)
    SELECT nd.n_days, agg.c AS concordant, agg.dd AS discordant,
           round((agg.c - agg.dd)
                 / sqrt(CAST(agg.n0 - agg.n1 AS DOUBLE) * (agg.n0 - agg.n2)), 6) AS tau_b
    FROM nd CROSS JOIN agg
    """,
)


def _dtaub(spark, sf_dir):
    """Tau-b over the bounded day-pair join."""
    o = t(spark, sf_dir, "orders")
    d = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.count("*").cast("long").alias("x"),
            F.sum(F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("y"),
        )
        .localCheckpoint(eager=False)
    )
    a = d.select(F.col("day").alias("da"), F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = d.select(F.col("day").alias("db"), F.col("x").alias("xb"), F.col("y").alias("yb"))
    p = a.join(b, F.col("da") < F.col("db")).select(
        F.when((F.col("xa") - F.col("xb")) * (F.col("ya") - F.col("yb")) > 0, 1)
        .otherwise(0)
        .alias("conc"),
        F.when((F.col("xa") - F.col("xb")) * (F.col("ya") - F.col("yb")) < 0, 1)
        .otherwise(0)
        .alias("disc"),
        F.when(F.col("xa") == F.col("xb"), 1).otherwise(0).alias("tx"),
        F.when(F.col("ya") == F.col("yb"), 1).otherwise(0).alias("ty"),
    )
    agg = p.agg(
        F.count("*").cast("long").alias("n0"),
        F.sum("conc").cast("long").alias("c"),
        F.sum("disc").cast("long").alias("dd"),
        F.sum("tx").cast("long").alias("n1"),
        F.sum("ty").cast("long").alias("n2"),
    )
    nd = d.agg(F.count("*").cast("long").alias("n_days"))
    return nd.crossJoin(F.broadcast(agg)).select(
        "n_days",
        F.col("c").alias("concordant"),
        F.col("dd").alias("discordant"),
        F.round(
            (F.col("c") - F.col("dd"))
            / F.sqrt((F.col("n0") - F.col("n1")).cast("double") * (F.col("n0") - F.col("n2"))),
            6,
        ).alias("tau_b"),
    )


CATALOG["ml_kendall_tau_b_daily"].fn = _dtaub


register(
    "ml_poisson_two_rate_test",
    # two-sample Poisson rate test: urgent-order arrivals per day in
    # 1996 vs 1997 (fixed 366/365-day exposures as integer literals).
    # Counts are exact; the rate difference z-score is one fixed
    # expression over the single conditional-aggregate row.
    oracle="""
    WITH mo AS (
      SELECT
        CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                       AND o_orderdate < TIMESTAMP '1997-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01'
                       AND o_orderdate < TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS c2
      FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    SELECT c1, c2,
           round(CAST(c1 AS DOUBLE) / 366.0, 6) AS rate_1996,
           round(CAST(c2 AS DOUBLE) / 365.0, 6) AS rate_1997,
           round((CAST(c1 AS DOUBLE) / 366.0 - CAST(c2 AS DOUBLE) / 365.0)
                 / sqrt(CAST(c1 AS DOUBLE) / (366.0 * 366.0)
                        + CAST(c2 AS DOUBLE) / (365.0 * 365.0)), 6) AS z
    FROM mo
    """,
)


def _dpoissonrate(spark, sf_dir):
    """Two-rate Poisson z from one conditional-aggregate row."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")

    def _in(y0, y1):
        return (F.col("o_orderdate") >= F.lit(f"{y0}-01-01").cast("timestamp")) & (
            F.col("o_orderdate") < F.lit(f"{y1}-01-01").cast("timestamp")
        )

    mo = o.agg(
        F.sum(F.when(_in(1996, 1997), 1).otherwise(0)).cast("long").alias("c1"),
        F.sum(F.when(_in(1997, 1998), 1).otherwise(0)).cast("long").alias("c2"),
    )
    r1 = F.col("c1").cast("double") / 366.0
    r2 = F.col("c2").cast("double") / 365.0
    return mo.select(
        "c1",
        "c2",
        F.round(r1, 6).alias("rate_1996"),
        F.round(r2, 6).alias("rate_1997"),
        F.round(
            (r1 - r2)
            / F.sqrt(
                F.col("c1").cast("double") / (366.0 * 366.0)
                + F.col("c2").cast("double") / (365.0 * 365.0)
            ),
            6,
        ).alias("z"),
    )


CATALOG["ml_poisson_two_rate_test"].fn = _dpoissonrate


register(
    "lineitem_quantity_mode_entropy",
    # distribution-shape profile per return flag: the modal quantity
    # (argmax over the 50-value histogram, smallest value on ties),
    # its share, and the Shannon entropy of the quantity distribution
    # — per-cell p*ln(p) terms micro-quantized before the per-flag
    # integer sum, ln rounded once at 6 dp.
    oracle="""
    WITH h AS MATERIALIZED (
      SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS q,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2
    ),
    w AS (
      SELECT flag, q, c,
             CAST(SUM(c) OVER (PARTITION BY flag) AS BIGINT) AS n,
             ROW_NUMBER() OVER (PARTITION BY flag ORDER BY c DESC, q) AS rn
      FROM h
    ),
    ent AS (
      SELECT flag, MAX(n) AS n,
             CAST(SUM(CAST(floor((CAST(c AS DOUBLE) / n)
                                 * round(ln(CAST(c AS DOUBLE) / n), 6)
                                 * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS e6
      FROM w GROUP BY flag
    ),
    md AS (
      SELECT flag, q AS mode_qty, c AS mode_count, n FROM w WHERE rn = 1
    )
    SELECT md.flag, md.n AS n_rows, md.mode_qty,
           round(CAST(md.mode_count AS DOUBLE) / md.n, 6) AS mode_share,
           round(-ent.e6 / 1000000.0, 6) AS entropy_nats
    FROM md JOIN ent ON ent.flag = md.flag
    ORDER BY md.flag
    """,
)


def _dmodeentropy(spark, sf_dir):
    """Mode + entropy per flag from the 150-row quantity histogram."""
    li = t(spark, sf_dir, "lineitem")
    h = (
        li.groupBy(
            F.col("l_returnflag").alias("flag"), F.col("l_quantity").cast("long").alias("q")
        )
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    wn = Window.partitionBy("flag")
    wr = Window.partitionBy("flag").orderBy(F.desc("c"), "q")
    w = h.select(
        "flag",
        "q",
        "c",
        F.sum("c").over(wn).cast("long").alias("n"),
        F.row_number().over(wr).alias("rn"),
    ).localCheckpoint(eager=False)
    p = F.col("c").cast("double") / F.col("n")
    ent = w.groupBy("flag").agg(
        F.max("n").alias("n"),
        F.sum(F.floor(p * F.round(F.log(p), 6) * 1000000 + 0.5).cast("long"))
        .cast("long")
        .alias("e6"),
    )
    md = w.filter(F.col("rn") == 1).select(
        "flag", F.col("q").alias("mode_qty"), F.col("c").alias("mode_count"), "n"
    )
    return (
        md.join(ent.select("flag", "e6"), "flag")
        .select(
            "flag",
            F.col("n").alias("n_rows"),
            "mode_qty",
            F.round(F.col("mode_count").cast("double") / F.col("n"), 6).alias("mode_share"),
            F.round(-F.col("e6") / 1000000.0, 6).alias("entropy_nats"),
        )
        .orderBy("flag")
    )


CATALOG["lineitem_quantity_mode_entropy"].fn = _dmodeentropy


