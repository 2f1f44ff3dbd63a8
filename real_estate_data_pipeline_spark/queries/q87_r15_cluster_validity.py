"""Round-15 wave 7: embedding-space cluster validity — Davies-Bouldin,
Calinski-Harabasz and the centroid-form Dunn index over the label
clusters (the scale-safe centroid projections of the r9 silhouette
machinery: no pairwise point distances anywhere), plus the Hopkins
clusterability statistic with bit-reproducible sha2 probe draws and
sha2-synthesized uniform reference points (the ops/sampling
hash-uniform01 idiom).

Exactness: centroid dims are exact micro-integer means snapped to
6dp (the silhouette idiom); every per-dim squared gap quantizes to
integer micro-units BEFORE the 64-term sum; per-cluster scatter sums
are integer; the few cross-cluster reductions (10 R_max terms, 25
probe minima) micro-quantize before their integer sums. sqrt is
IEEE-exact.
"""

from __future__ import annotations

from ._registry import CATALOG, F, register, t

# The r9 silhouette dims/cent blocks, verbatim (per-dim micro-integer
# centroid means snapped to 6dp).
_DIMS_CENT = """dims AS MATERIALIZED (
      SELECT vec_id, label,
             unnest(embedding) AS x,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    ),
    cent AS MATERIALIZED (
      SELECT label AS clabel, pos,
             round(CAST(SUM(CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                                 AS BIGINT)) AS DOUBLE)
                   / COUNT(*) / 1000000.0, 6) AS c
      FROM dims GROUP BY label, pos
    ),
    own AS MATERIALIZED (
      SELECT d.vec_id, d.label,
             CAST(SUM(CAST(floor(round((CAST(d.x AS DOUBLE) - ct.c)
                                        * (CAST(d.x AS DOUBLE) - ct.c), 6)
                                  * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS own6
      FROM dims d JOIN cent ct ON ct.pos = d.pos AND ct.clabel = d.label
      GROUP BY d.vec_id, d.label
    ),
    cd AS (
      SELECT a.clabel AS i, b.clabel AS j,
             CAST(SUM(CAST(floor(round((a.c - b.c) * (a.c - b.c), 6)
                                  * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS d2_6
      FROM cent a JOIN cent b ON a.pos = b.pos AND a.clabel < b.clabel
      GROUP BY 1, 2
    )"""


def _emb_frames(spark, sf_dir):
    """(points, centroid-arrays, own-distance) triple — the Spark twin
    of _DIMS_CENT: centroids meet every vector through a broadcast
    zip_with fold, never a dim explosion on the point side."""
    e = t(spark, sf_dir, "embeddings").localCheckpoint(eager=False)
    cent = (
        e.select("label", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(
            F.round(
                F.sum(F.floor(F.col("x").cast("double") * 1e6 + 0.5).cast("long"))
                .cast("double")
                / F.count("*")
                / 1e6,
                6,
            ).alias("c")
        )
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("__pc"))
        .select(
            F.col("label").alias("clabel"),
            F.transform("__pc", lambda s: s["c"]).alias("cvec"),
        )
        .localCheckpoint(eager=False)
    )
    term = lambda x, c: F.floor(  # noqa: E731
        F.round((x.cast("double") - c) * (x.cast("double") - c), 6) * 1e6 + 0.5
    ).cast("long")
    own = (
        e.join(F.broadcast(cent), e["label"] == cent["clabel"])
        .select(
            "vec_id",
            "label",
            F.aggregate(
                F.zip_with(F.col("embedding"), F.col("cvec"), term),
                F.lit(0).cast("long"),
                lambda acc, z: acc + z,
            ).alias("own6"),
        )
        .localCheckpoint(eager=False)
    )
    zterm = lambda a, b: F.floor(  # noqa: E731
        F.round((a - b) * (a - b), 6) * 1e6 + 0.5
    ).cast("long")
    ca = cent.select(F.col("clabel").alias("i"), F.col("cvec").alias("va"))
    cb = cent.select(F.col("clabel").alias("j"), F.col("cvec").alias("vb"))
    cd = (
        ca.crossJoin(F.broadcast(cb))
        .filter(F.col("i") < F.col("j"))
        .select(
            "i",
            "j",
            F.aggregate(
                F.zip_with(F.col("va"), F.col("vb"), zterm),
                F.lit(0).cast("long"),
                lambda acc, z: acc + z,
            ).alias("d2_6"),
        )
    )
    return e, cent, own, cd


register(
    "emb_davies_bouldin_labels",
    # DB index: s_i = mean point-to-own-centroid distance (per-point
    # sqrt micro-quantized, integer-summed), R_ij = (s_i+s_j)/d(c_i,
    # c_j), DB = mean over clusters of max_j R_ij (the 10 R_max terms
    # micro-quantized before the final sum).
    oracle=f"""
    WITH {_DIMS_CENT},
    si AS (
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n_i,
             CAST(SUM(CAST(floor(sqrt(own6 / 1e6) * 1000000 + 0.5) AS BIGINT))
               AS BIGINT) AS sd6
      FROM own GROUP BY label
    ),
    sv AS (SELECT label, CAST(sd6 AS DOUBLE) / n_i / 1e6 AS s FROM si),
    rij AS (
      SELECT cd.i, cd.j, (a.s + b.s) / sqrt(cd.d2_6 / 1e6) AS r
      FROM cd JOIN sv a ON cd.i = a.label JOIN sv b ON cd.j = b.label
    ),
    rmax AS (
      SELECT lab, CAST(floor(MAX(r) * 1000000 + 0.5) AS BIGINT) AS r6
      FROM (SELECT i AS lab, r FROM rij UNION ALL SELECT j AS lab, r FROM rij)
      GROUP BY lab
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS k,
           round(CAST(SUM(r6) AS DOUBLE) / COUNT(*) / 1e6, 6) AS db_index
    FROM rmax
    """,
)


def _ddaviesbouldin(spark, sf_dir):
    """Davies-Bouldin off the shared centroid frames."""
    e, cent, own, cd = _emb_frames(spark, sf_dir)
    si = own.groupBy("label").agg(
        F.count("*").cast("long").alias("n_i"),
        F.sum(
            F.floor(F.sqrt(F.col("own6") / 1e6) * F.lit(1000000) + F.lit(0.5)).cast(
                "long"
            )
        )
        .cast("long")
        .alias("sd6"),
    )
    sv = si.select(
        "label", (F.col("sd6").cast("double") / F.col("n_i") / F.lit(1e6)).alias("s")
    )
    a = sv.select(F.col("label").alias("i"), F.col("s").alias("sa"))
    b = sv.select(F.col("label").alias("j"), F.col("s").alias("sb"))
    rij = (
        cd.join(F.broadcast(a), "i")
        .join(F.broadcast(b), "j")
        .select(
            "i",
            "j",
            ((F.col("sa") + F.col("sb")) / F.sqrt(F.col("d2_6") / F.lit(1e6))).alias(
                "r"
            ),
        )
    )
    both = rij.select(F.col("i").alias("lab"), "r").unionAll(
        rij.select(F.col("j").alias("lab"), "r")
    )
    rmax = both.groupBy("lab").agg(
        F.floor(F.max("r") * F.lit(1000000) + F.lit(0.5)).cast("long").alias("r6")
    )
    return rmax.agg(
        F.count("*").cast("long").alias("k"),
        F.round(F.sum("r6").cast("double") / F.count("*") / F.lit(1e6), 6).alias(
            "db_index"
        ),
    )


CATALOG["emb_davies_bouldin_labels"].fn = _ddaviesbouldin


register(
    "emb_calinski_harabasz_labels",
    # CH (pseudo-F): within scatter W = sum own6 (pure integer);
    # between scatter B = sum_i n_i * ||c_i - cbar||^2 with the global
    # centroid from the same exact micro-integer means, per-dim gaps
    # quantized; CH = (B/(k-1)) / (W/(n-k)).
    oracle=f"""
    WITH {_DIMS_CENT},
    gbar AS (
      SELECT pos,
             round(CAST(SUM(CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                                 AS BIGINT)) AS DOUBLE)
                   / COUNT(*) / 1000000.0, 6) AS g
      FROM dims GROUP BY pos
    ),
    cnt AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_i
            FROM embeddings GROUP BY label),
    bt AS (
      SELECT ct.clabel,
             CAST(SUM(CAST(floor(round((ct.c - g.g) * (ct.c - g.g), 6)
                                  * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS c2_6
      FROM cent ct JOIN gbar g ON g.pos = ct.pos GROUP BY ct.clabel
    ),
    agg AS (
      SELECT CAST(SUM(cnt.n_i) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(cnt.n_i * bt.c2_6) AS BIGINT) AS b6
      FROM bt JOIN cnt ON bt.clabel = cnt.label
    ),
    w AS (SELECT CAST(SUM(own6) AS BIGINT) AS w6 FROM own)
    SELECT n, k,
           round(w6 / 1e6, 6) AS w_ss,
           round(b6 / 1e6, 6) AS b_ss,
           round((b6 / 1e6 / (k - 1)) / (w6 / 1e6 / (n - k)), 6) AS ch_index
    FROM agg CROSS JOIN w
    """,
)


def _dcalinski(spark, sf_dir):
    """Calinski-Harabasz pseudo-F off the shared frames."""
    e, cent, own, cd = _emb_frames(spark, sf_dir)
    gbar = (
        e.select(F.posexplode("embedding").alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.round(
                F.sum(F.floor(F.col("x").cast("double") * 1e6 + 0.5).cast("long"))
                .cast("double")
                / F.count("*")
                / 1e6,
                6,
            ).alias("g")
        )
        .agg(F.array_sort(F.collect_list(F.struct("pos", "g"))).alias("__pg"))
        .select(F.transform("__pg", lambda s: s["g"]).alias("gvec"))
    )
    zterm = lambda a, b: F.floor(  # noqa: E731
        F.round((a - b) * (a - b), 6) * 1e6 + 0.5
    ).cast("long")
    cnt = e.groupBy("label").agg(F.count("*").cast("long").alias("n_i"))
    bt = (
        cent.crossJoin(F.broadcast(gbar))
        .select(
            "clabel",
            F.aggregate(
                F.zip_with(F.col("cvec"), F.col("gvec"), zterm),
                F.lit(0).cast("long"),
                lambda acc, z: acc + z,
            ).alias("c2_6"),
        )
        .join(F.broadcast(cnt), F.col("clabel") == F.col("label"))
    )
    agg = bt.agg(
        F.sum("n_i").cast("long").alias("n"),
        F.count("*").cast("long").alias("k"),
        F.sum(F.col("n_i") * F.col("c2_6")).cast("long").alias("b6"),
    )
    w = own.agg(F.sum("own6").cast("long").alias("w6"))
    j = agg.crossJoin(F.broadcast(w))
    return j.select(
        "n",
        "k",
        F.round(F.col("w6") / F.lit(1e6), 6).alias("w_ss"),
        F.round(F.col("b6") / F.lit(1e6), 6).alias("b_ss"),
        F.round(
            (F.col("b6") / F.lit(1e6) / (F.col("k") - 1))
            / (F.col("w6") / F.lit(1e6) / (F.col("n") - F.col("k"))),
            6,
        ).alias("ch_index"),
    )


CATALOG["emb_calinski_harabasz_labels"].fn = _dcalinski


register(
    "emb_dunn_centroid_index",
    # Centroid-form Dunn: min inter-centroid distance over the max
    # cluster diameter (2 * max point-to-own-centroid distance) —
    # the O(n) projection of the O(n^2) classic. Both extrema reduce
    # over INTEGER micro-unit squared distances (sqrt is monotone).
    oracle=f"""
    WITH {_DIMS_CENT},
    mn AS (SELECT CAST(MIN(d2_6) AS BIGINT) AS min_cd FROM cd),
    mx AS (SELECT CAST(MAX(own6) AS BIGINT) AS max_own FROM own)
    SELECT round(sqrt(min_cd / 1e6), 6) AS min_intercentroid,
           round(2 * sqrt(max_own / 1e6), 6) AS max_diameter,
           round(sqrt(min_cd / 1e6) / (2 * sqrt(max_own / 1e6)), 9)
             AS dunn_centroid
    FROM mn CROSS JOIN mx
    """,
)


def _ddunn(spark, sf_dir):
    """Centroid Dunn index off integer extrema."""
    e, cent, own, cd = _emb_frames(spark, sf_dir)
    mn = cd.agg(F.min("d2_6").cast("long").alias("min_cd"))
    mx = own.agg(F.max("own6").cast("long").alias("max_own"))
    j = mn.crossJoin(F.broadcast(mx))
    dmin = F.sqrt(F.col("min_cd") / F.lit(1e6))
    diam = 2 * F.sqrt(F.col("max_own") / F.lit(1e6))
    return j.select(
        F.round(dmin, 6).alias("min_intercentroid"),
        F.round(diam, 6).alias("max_diameter"),
        F.round(dmin / diam, 9).alias("dunn_centroid"),
    )


CATALOG["emb_dunn_centroid_index"].fn = _ddunn


register(
    "emb_hopkins_clusterability",
    # Hopkins statistic (simple-sum form): 25 real probes drawn by the
    # sha2 key hash (bit-reproducible on both engines), 25 uniform
    # reference points synthesized per dim as mn + (mx-mn)*u with
    # u = first-8-hex-chars(sha256(i || '_' || pos || 'hopu'))/2^32;
    # H = sum u_dist / (sum u_dist + sum w_dist) over nearest-neighbor
    # distances (per-probe minima of integer micro-unit d^2, sqrt'd
    # and micro-quantized before the 25-term sums). H ~ 0.5 means
    # uniform, -> 1 means clustered.
    oracle=f"""
    WITH dims AS MATERIALIZED (
      SELECT vec_id,
             unnest(embedding) AS x,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    ),
    bounds AS (
      SELECT pos, MIN(CAST(x AS DOUBLE)) AS mn, MAX(CAST(x AS DOUBLE)) AS mx
      FROM dims GROUP BY pos
    ),
    probes AS (
      SELECT vec_id FROM (
        SELECT vec_id,
               ROW_NUMBER() OVER (
                 ORDER BY ('0x' || substr(sha256(CAST(vec_id AS VARCHAR)
                                                 || 'hopkins-s'), 1, 8))::UBIGINT,
                          vec_id) AS rn
        FROM embeddings
      ) WHERE rn <= 25
    ),
    refs AS (
      SELECT i, b.pos,
             b.mn + (b.mx - b.mn)
               * (('0x' || substr(sha256(CAST(i AS VARCHAR) || '_'
                                         || CAST(b.pos AS VARCHAR)
                                         || 'hopu'), 1, 8))::UBIGINT
                  / 4294967296.0) AS r
      FROM range(1, 26) t(i) CROSS JOIN bounds b
    ),
    wmin AS (
      SELECT p.vec_id,
             CAST(MIN(dd.d2_6) AS BIGINT) AS m2
      FROM probes p
      JOIN (
        SELECT a.vec_id AS pa, d.vec_id AS pb,
               CAST(SUM(CAST(floor(round((CAST(a.x AS DOUBLE)
                                          - CAST(d.x AS DOUBLE))
                                         * (CAST(a.x AS DOUBLE)
                                            - CAST(d.x AS DOUBLE)), 6)
                                    * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS d2_6
        FROM dims a JOIN dims d ON a.pos = d.pos AND a.vec_id <> d.vec_id
        WHERE a.vec_id IN (SELECT vec_id FROM probes)
        GROUP BY 1, 2
      ) dd ON dd.pa = p.vec_id
      GROUP BY p.vec_id
    ),
    umin AS (
      SELECT r.i, CAST(MIN(dd.d2_6) AS BIGINT) AS m2
      FROM (SELECT DISTINCT i FROM refs) r
      JOIN (
        SELECT rf.i AS ri, d.vec_id,
               CAST(SUM(CAST(floor(round((rf.r - CAST(d.x AS DOUBLE))
                                         * (rf.r - CAST(d.x AS DOUBLE)), 6)
                                    * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS d2_6
        FROM refs rf JOIN dims d ON rf.pos = d.pos
        GROUP BY 1, 2
      ) dd ON dd.ri = r.i
      GROUP BY r.i
    ),
    s AS (
      SELECT
        (SELECT CAST(SUM(CAST(floor(sqrt(m2 / 1e6) * 1000000 + 0.5) AS BIGINT))
           AS BIGINT) FROM umin) AS su6,
        (SELECT CAST(SUM(CAST(floor(sqrt(m2 / 1e6) * 1000000 + 0.5) AS BIGINT))
           AS BIGINT) FROM wmin) AS sw6
    )
    SELECT CAST(25 AS BIGINT) AS m,
           round(su6 / 1e6, 6) AS sum_u,
           round(sw6 / 1e6, 6) AS sum_w,
           round(CAST(su6 AS DOUBLE) / (su6 + sw6), 9) AS hopkins
    FROM s
    """,
)


def _dhopkins(spark, sf_dir):
    """Hopkins H: 25 hash-drawn probes + 25 hash-synthesized uniform
    refs, each meeting the corpus through a broadcast zip_with fold
    (O(n*m*d) work, no pairwise blow-up)."""
    e = t(spark, sf_dir, "embeddings").localCheckpoint(eager=False)
    h = lambda s: F.conv(F.substring(F.sha2(s, 256), 1, 8), 16, 10).cast(  # noqa: E731
        "bigint"
    )
    probes = (
        e.select("vec_id", "embedding")
        .orderBy(h(F.concat(F.col("vec_id").cast("string"), F.lit("hopkins-s"))), "vec_id")
        .limit(25)
        .withColumnRenamed("vec_id", "pid")
        .withColumnRenamed("embedding", "pvec")
    )
    bounds = (
        e.select(F.posexplode("embedding").alias("pos0", "x"))
        .select((F.col("pos0") + 1).alias("pos"), "x")
        .groupBy("pos")
        .agg(
            F.min(F.col("x").cast("double")).alias("mn"),
            F.max(F.col("x").cast("double")).alias("mx"),
        )
    )
    refs_dim = (
        spark.range(1, 26)
        .select(F.col("id").cast("int").alias("i"))
        .crossJoin(F.broadcast(bounds))
        .select(
            "i",
            "pos",
            (
                F.col("mn")
                + (F.col("mx") - F.col("mn"))
                * (
                    h(
                        F.concat(
                            F.col("i").cast("string"),
                            F.lit("_"),
                            F.col("pos").cast("string"),
                            F.lit("hopu"),
                        )
                        .cast("string")
                    )
                    / F.lit(4294967296.0)
                )
            ).alias("r"),
        )
    )
    refs = (
        refs_dim.groupBy("i")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "r"))).alias("__pr"))
        .select("i", F.transform("__pr", lambda s: s["r"]).alias("rvec"))
    )
    term = lambda a, b: F.floor(  # noqa: E731
        F.round((a.cast("double") - b) * (a.cast("double") - b), 6) * 1e6 + 0.5
    ).cast("long")
    wmin = (
        e.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("pid"))
        .select(
            "pid",
            F.aggregate(
                F.zip_with(F.col("pvec"), F.col("embedding"), term),
                F.lit(0).cast("long"),
                lambda acc, z: acc + z,
            ).alias("d2_6"),
        )
        .groupBy("pid")
        .agg(F.min("d2_6").cast("long").alias("m2"))
    )
    rterm = lambda r, x: F.floor(  # noqa: E731
        F.round((r - x.cast("double")) * (r - x.cast("double")), 6) * 1e6 + 0.5
    ).cast("long")
    umin = (
        e.crossJoin(F.broadcast(refs))
        .select(
            "i",
            F.aggregate(
                F.zip_with(F.col("rvec"), F.col("embedding"), rterm),
                F.lit(0).cast("long"),
                lambda acc, z: acc + z,
            ).alias("d2_6"),
        )
        .groupBy("i")
        .agg(F.min("d2_6").cast("long").alias("m2"))
    )
    q6 = lambda c: F.floor(F.sqrt(c / F.lit(1e6)) * F.lit(1000000) + F.lit(0.5)).cast(  # noqa: E731
        "long"
    )
    su = umin.agg(F.sum(q6(F.col("m2"))).cast("long").alias("su6"))
    sw = wmin.agg(F.sum(q6(F.col("m2"))).cast("long").alias("sw6"))
    j = su.crossJoin(F.broadcast(sw))
    return j.select(
        F.lit(25).cast("long").alias("m"),
        F.round(F.col("su6") / F.lit(1e6), 6).alias("sum_u"),
        F.round(F.col("sw6") / F.lit(1e6), 6).alias("sum_w"),
        F.round(
            F.col("su6").cast("double") / (F.col("su6") + F.col("sw6")), 9
        ).alias("hopkins"),
    )


CATALOG["emb_hopkins_clusterability"].fn = _dhopkins
