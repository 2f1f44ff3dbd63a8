"""Split from queries.py lines 26521-27039 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, register, t, tok_arr
from .q15_curation_r3 import (
    _HOURLY_TYPE_CENTS_CTE,
    _events_stream_schema,
    _hourly_type_cents,
    _run_stream_to_memory,
    _stream_file_source,
)
from .q26_r8_mixed import _cms_cell

# ===========================================================================
# round-10 wave 8: CMS inner product, weighted kappa, Cochran's Q,
# Theil's U2, token-length entropy, and the 18th streaming run (HLL
# cardinality as streaming state).
# ===========================================================================

register(
    "sketch_cms_inner_product",
    # the second thing a Count-Min sketch can estimate besides point
    # frequencies: the INNER PRODUCT of two frequency vectors —
    # est = min over rows of dot(rowA, rowB), never an underestimate.
    # Here: per-user event-count vectors of the odd-day vs even-day
    # halves (a self-join-free 'how much do the same users drive both
    # periods'). Sketch cells are the portable sha2 family, every
    # quantity is an exact integer, and the report carries the exact
    # inner product next to the estimate.
    oracle="""
    WITH uc AS MATERIALIZED (
      SELECT user_id,
             CAST(SUM(CASE WHEN date_part('day', ts) % 2 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN date_part('day', ts) % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS cb
      FROM events GROUP BY user_id
    ),
    cells AS MATERIALIZED (
      SELECT u.user_id, u.ca, u.cb, r.r,
             ('0x' || substr(sha256(CAST(u.user_id AS VARCHAR) || 'cms'
                                    || CAST(r.r AS VARCHAR)), 1, 8))::UBIGINT % 512
                 AS cell
      FROM uc u CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS r) r
    ),
    sk AS (
      SELECT r, cell,
             CAST(SUM(ca) AS BIGINT) AS ta,
             CAST(SUM(cb) AS BIGINT) AS tb
      FROM cells GROUP BY r, cell
    ),
    rowdot AS (
      SELECT r, CAST(SUM(CAST(ta AS HUGEINT) * tb) AS BIGINT) AS dot
      FROM sk GROUP BY r
    ),
    est AS (SELECT CAST(MIN(dot) AS BIGINT) AS cms_estimate FROM rowdot),
    tru AS (
      SELECT CAST(SUM(CAST(ca AS HUGEINT) * cb) AS BIGINT) AS true_ip,
             CAST(SUM(CASE WHEN ca > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_users_a,
             CAST(SUM(CASE WHEN cb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_users_b
      FROM uc
    )
    SELECT tru.n_users_a, tru.n_users_b, tru.true_ip AS true_inner_product,
           est.cms_estimate,
           CAST(est.cms_estimate - tru.true_ip AS BIGINT) AS overestimate
    FROM tru CROSS JOIN est
    """,
)


def _dcmsip(spark, sf_dir):
    """CMS inner product: ONE per-user pass carries both halves'
    counts, both sketches build from the same 2048-cell aggregate, and
    the estimate is a 4-row min of per-row dots — period-overlap mass
    estimated from two fixed-size sketches that never see each other's
    raw data (the cross-silo join-size estimation trick)."""
    ev = t(spark, sf_dir, "events")
    uc = (
        ev.groupBy("user_id")
        .agg(
            F.sum(F.when(F.dayofmonth("ts") % 2 == 1, 1).otherwise(0))
            .cast("long")
            .alias("ca"),
            F.sum(F.when(F.dayofmonth("ts") % 2 == 0, 1).otherwise(0))
            .cast("long")
            .alias("cb"),
        )
        .localCheckpoint(eager=False)
    )
    cells = uc.select(
        "user_id", "ca", "cb", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("r")
    ).withColumn("cell", _cms_cell())
    sk = cells.groupBy("r", "cell").agg(
        F.sum("ca").cast("long").alias("ta"),
        F.sum("cb").cast("long").alias("tb"),
    )
    rowdot = sk.groupBy("r").agg(
        F.sum(F.col("ta").cast("decimal(19,0)") * F.col("tb"))
        .cast("long")
        .alias("dot")
    )
    est = rowdot.agg(F.min("dot").cast("long").alias("cms_estimate"))
    tru = uc.agg(
        F.sum(F.col("ca").cast("decimal(19,0)") * F.col("cb"))
        .cast("long")
        .alias("true_ip"),
        F.sum(F.when(F.col("ca") > 0, 1).otherwise(0)).cast("long").alias("n_users_a"),
        F.sum(F.when(F.col("cb") > 0, 1).otherwise(0)).cast("long").alias("n_users_b"),
    )
    return tru.crossJoin(F.broadcast(est)).select(
        "n_users_a",
        "n_users_b",
        F.col("true_ip").alias("true_inner_product"),
        "cms_estimate",
        (F.col("cms_estimate") - F.col("true_ip")).cast("long").alias("overestimate"),
    )


CATALOG["sketch_cms_inner_product"].fn = _dcmsip

register(
    "ml_weighted_kappa_quartiles",
    # ordinal agreement: linear-weighted Cohen's kappa between the
    # price quartile and the quantity band of each lineitem. With
    # weights w_ij = |i-j|, kappa_w = 1 - n*sum(w*O) / sum(w*ri*cj) —
    # the scale factor cancels, so everything is exact wide integers
    # until one division. The ordinal twin of the plain-kappa query.
    oracle="""
    WITH x AS MATERIALIZED (
      SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc,
             CASE WHEN CAST(l_quantity AS BIGINT) <= 12 THEN 1
                  WHEN CAST(l_quantity AS BIGINT) <= 25 THEN 2
                  WHEN CAST(l_quantity AS BIGINT) <= 37 THEN 3
                  ELSE 4 END AS qb
      FROM lineitem
    ),
    edges AS (
      -- QUADRUPLED quartile edges: 4*(a + f*(b-a)) is an exact integer
      -- for f in {.25,.5,.75} on an integer domain, where 2*quartile is
      -- a half-integer whenever the neighbor gap is odd — and DuckDB's
      -- CAST rounds half-integers while Spark's cast truncates (review
      -- finding). floor(x+0.5) belt-and-braces both sides.
      SELECT CAST(floor(4 * quantile_cont(pc, 0.25) + 0.5) AS BIGINT) AS e1,
             CAST(floor(4 * quantile_cont(pc, 0.50) + 0.5) AS BIGINT) AS e2,
             CAST(floor(4 * quantile_cont(pc, 0.75) + 0.5) AS BIGINT) AS e3
      FROM x
    ),
    y AS (
      SELECT CASE WHEN 4 * pc <= e1 THEN 1
                  WHEN 4 * pc <= e2 THEN 2
                  WHEN 4 * pc <= e3 THEN 3
                  ELSE 4 END AS pq, qb
      FROM x CROSS JOIN edges
    ),
    cellsm AS MATERIALIZED (
      SELECT pq, qb, CAST(COUNT(*) AS BIGINT) AS o FROM y GROUP BY 1, 2
    ),
    ri AS (SELECT pq, CAST(SUM(o) AS BIGINT) AS r FROM cellsm GROUP BY 1),
    cj AS (SELECT qb, CAST(SUM(o) AS BIGINT) AS c FROM cellsm GROUP BY 1),
    nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cellsm),
    wo AS (
      SELECT CAST(SUM(abs(pq - qb) * o) AS BIGINT) AS swo FROM cellsm
    ),
    we AS (
      SELECT CAST(SUM(abs(ri.pq - cj.qb) * CAST(ri.r AS HUGEINT) * cj.c)
                  AS BIGINT) AS swe
      FROM ri CROSS JOIN cj
    )
    SELECT nn.n AS n_rows, wo.swo AS weighted_disagreement,
           round(1.0 - CAST(CAST(nn.n AS HUGEINT) * wo.swo AS DOUBLE)
                       / CAST(we.swe AS DOUBLE), 6) AS weighted_kappa
    FROM nn CROSS JOIN wo CROSS JOIN we
    """,
)


def _dweightedkappa(spark, sf_dir):
    """Linear-weighted kappa: one exact-quartile pass, one 4x4 cell
    count, marginal cross products on a 16-row grid — ordinal
    agreement between any two bandings at two corpus passes."""
    li = t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    x = li.select(
        (F.col("l_extendedprice").cast(DEC) * 100).cast("long").alias("pc"),
        F.when(q <= 12, 1).when(q <= 25, 2).when(q <= 37, 3).otherwise(4).alias("qb"),
    ).localCheckpoint(eager=False)
    edges = x.agg(
        F.floor(4 * F.percentile("pc", 0.25) + 0.5).cast("long").alias("e1"),
        F.floor(4 * F.percentile("pc", 0.50) + 0.5).cast("long").alias("e2"),
        F.floor(4 * F.percentile("pc", 0.75) + 0.5).cast("long").alias("e3"),
    )
    pq = (
        F.when(4 * F.col("pc") <= F.col("e1"), 1)
        .when(4 * F.col("pc") <= F.col("e2"), 2)
        .when(4 * F.col("pc") <= F.col("e3"), 3)
        .otherwise(4)
    )
    y = x.crossJoin(F.broadcast(edges)).select(pq.alias("pq"), "qb")
    cells = y.groupBy("pq", "qb").agg(
        F.count("*").cast("long").alias("o")
    ).localCheckpoint(eager=False)
    ri = cells.groupBy("pq").agg(F.sum("o").cast("long").alias("r"))
    cj = cells.groupBy("qb").agg(F.sum("o").cast("long").alias("c"))
    nn = cells.agg(F.sum("o").cast("long").alias("n"))
    wo = cells.agg(
        F.sum(F.abs(F.col("pq") - F.col("qb")) * F.col("o"))
        .cast("long")
        .alias("swo")
    )
    we = (
        ri.crossJoin(F.broadcast(cj))
        .agg(
            F.sum(
                F.abs(F.col("pq") - F.col("qb"))
                * F.col("r").cast("decimal(19,0)")
                * F.col("c")
            )
            .cast("long")
            .alias("swe")
        )
    )
    return (
        nn.crossJoin(F.broadcast(wo))
        .crossJoin(F.broadcast(we))
        .select(
            F.col("n").alias("n_rows"),
            F.col("swo").alias("weighted_disagreement"),
            F.round(
                1.0
                - (F.col("n").cast("decimal(19,0)") * F.col("swo")).cast("double")
                / F.col("swe").cast("double"),
                6,
            ).alias("weighted_kappa"),
        )
    )


CATALOG["ml_weighted_kappa_quartiles"].fn = _dweightedkappa

register(
    "dq_cochran_q_filters",
    # do three quality filters pass the SAME docs, or different ones?
    # Cochran's Q for k=3 matched binary treatments (length >= 200
    # chars, >= 40 tokens, distinct-token ratio >= 0.5):
    # Q = 2 * sum(3*Cj - T)^2 / (3 * (3*T - sum(Ri^2))) — exact
    # integers until the final division, the k-filter extension of
    # McNemar.
    oracle="""
    WITH f AS MATERIALIZED (
      SELECT CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS f1,
             CASE WHEN len(list_filter(regexp_split_to_array(lower(trim(text)),
                                                             '\\s+'),
                           x -> x <> '')) >= 40 THEN 1 ELSE 0 END AS f2,
             CASE WHEN 2 * len(list_distinct(list_filter(
                          regexp_split_to_array(lower(trim(text)), '\\s+'),
                          x -> x <> '')))
                       >= len(list_filter(regexp_split_to_array(lower(trim(text)),
                                                                '\\s+'),
                              x -> x <> '')) THEN 1 ELSE 0 END AS f3
      FROM documents
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(f1) AS BIGINT) AS c1,
             CAST(SUM(f2) AS BIGINT) AS c2,
             CAST(SUM(f3) AS BIGINT) AS c3,
             CAST(SUM(f1 + f2 + f3) AS BIGINT) AS tt,
             CAST(SUM(CAST(f1 + f2 + f3 AS HUGEINT) * (f1 + f2 + f3)) AS BIGINT)
                 AS sr2
      FROM f
    )
    SELECT n AS n_docs, c1 AS pass_length, c2 AS pass_tokens, c3 AS pass_ttr,
           round(2.0 * (CAST(CAST(3 * c1 - tt AS HUGEINT) * (3 * c1 - tt)
                             + CAST(3 * c2 - tt AS HUGEINT) * (3 * c2 - tt)
                             + CAST(3 * c3 - tt AS HUGEINT) * (3 * c3 - tt)
                             AS DOUBLE))
                 / (3.0 * (3 * tt - sr2)), 6) AS cochran_q
    FROM agg
    """,
)


def _dcochranq(spark, sf_dir):
    """Cochran's Q in ONE aggregate: the three filter flags and both
    moment sums come out of a single scan (no per-filter pass), the
    statistic is one shared-order expression — the 'are my filters
    redundant' gate for any filter battery."""
    d = t(spark, sf_dir, "documents")
    tk = tok_arr(F.col("text"))
    f1 = F.when(F.col("n_chars") >= 200, 1).otherwise(0)
    f2 = F.when(F.size(tk) >= 40, 1).otherwise(0)
    f3 = F.when(2 * F.size(F.array_distinct(tk)) >= F.size(tk), 1).otherwise(0)
    f = d.select(f1.alias("f1"), f2.alias("f2"), f3.alias("f3"))
    rsum = F.col("f1") + F.col("f2") + F.col("f3")
    agg = f.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("f1").cast("long").alias("c1"),
        F.sum("f2").cast("long").alias("c2"),
        F.sum("f3").cast("long").alias("c3"),
        F.sum(rsum).cast("long").alias("tt"),
        F.sum(rsum.cast("decimal(12,0)") * rsum).cast("long").alias("sr2"),
    )

    def _sq(c):
        d_ = (3 * F.col(c) - F.col("tt")).cast("decimal(19,0)")
        return d_ * (3 * F.col(c) - F.col("tt"))

    return agg.select(
        F.col("n").alias("n_docs"),
        F.col("c1").alias("pass_length"),
        F.col("c2").alias("pass_tokens"),
        F.col("c3").alias("pass_ttr"),
        F.round(
            2.0
            * (_sq("c1") + _sq("c2") + _sq("c3")).cast("double")
            / (3.0 * (3 * F.col("tt") - F.col("sr2"))),
            6,
        ).alias("cochran_q"),
    )


CATALOG["dq_cochran_q_filters"].fn = _dcochranq

register(
    "evt_theil_u_forecast",
    # Theil's U2 under quadratic loss — the RMSE twin of the MASE
    # report: sqrt(sum((seasonal_err)^2) / sum((naive_err)^2)) per
    # event type, squared errors as exact wide integers on the same
    # timestamp-joined hourly frames. U2 < 1 = seasonal naive beats
    # last-value naive even where big misses dominate.
    oracle=f"""
    WITH {_HOURLY_TYPE_CENTS_CTE},
    se AS (
      SELECT a.event_type,
             CAST(a.cents - b.cents AS HUGEINT)
               * CAST(a.cents - b.cents AS HUGEINT) AS e2
      FROM obs a JOIN obs b
        ON b.event_type = a.event_type AND b.h = a.h - INTERVAL 24 HOUR
    ),
    nv AS (
      SELECT a.event_type,
             CAST(a.cents - b.cents AS HUGEINT)
               * CAST(a.cents - b.cents AS HUGEINT) AS e2
      FROM obs a JOIN obs b
        ON b.event_type = a.event_type AND b.h = a.h - INTERVAL 1 HOUR
    ),
    sa AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_s,
             CAST(SUM(e2) AS DOUBLE) AS s_s
      FROM se GROUP BY 1
    ),
    na AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_n,
             CAST(SUM(e2) AS DOUBLE) AS s_n
      FROM nv GROUP BY 1
    )
    SELECT sa.event_type, sa.n_s AS n_seasonal_points,
           round(sqrt(sa.s_s / sa.n_s) / 100.0, 6) AS rmse_seasonal,
           round(sqrt(na.s_n / na.n_n) / 100.0, 6) AS rmse_naive,
           round(sqrt((sa.s_s / sa.n_s) / (na.s_n / na.n_n)), 6) AS theil_u2
    FROM sa JOIN na USING (event_type)
    ORDER BY sa.event_type
    """,
)


def _dtheilu(spark, sf_dir):
    """Theil's U2: the MASE plan shape with squared-error integer
    sums — two timestamp self-joins on the bounded hourly frame, one
    types-sized report join."""
    obs = _hourly_type_cents(spark, sf_dir).localCheckpoint(eager=False)
    b24 = obs.select(
        "event_type",
        (F.col("h") + F.expr("INTERVAL 24 HOURS")).alias("h"),
        F.col("cents").alias("__pred"),
    )
    b1 = obs.select(
        "event_type",
        (F.col("h") + F.expr("INTERVAL 1 HOURS")).alias("h"),
        F.col("cents").alias("__pred"),
    )
    e2 = (F.col("cents") - F.col("__pred")).cast("decimal(19,0)") * (
        F.col("cents") - F.col("__pred")
    )
    sa = (
        obs.join(b24, ["event_type", "h"])
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_s"),
            F.sum(e2).cast("double").alias("s_s"),
        )
    )
    na = (
        obs.join(b1, ["event_type", "h"])
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_n"),
            F.sum(e2).cast("double").alias("s_n"),
        )
    )
    return (
        sa.join(na, "event_type")
        .select(
            "event_type",
            F.col("n_s").alias("n_seasonal_points"),
            F.round(F.sqrt(F.col("s_s") / F.col("n_s")) / 100.0, 6).alias(
                "rmse_seasonal"
            ),
            F.round(F.sqrt(F.col("s_n") / F.col("n_n")) / 100.0, 6).alias(
                "rmse_naive"
            ),
            F.round(
                F.sqrt((F.col("s_s") / F.col("n_s")) / (F.col("s_n") / F.col("n_n"))),
                6,
            ).alias("theil_u2"),
        )
        .orderBy("event_type")
    )


CATALOG["evt_theil_u_forecast"].fn = _dtheilu

register(
    "doc_token_length_entropy",
    # a language/tokenizer fingerprint that costs one GROUP BY: the
    # entropy of the token-LENGTH distribution per source (lengths are
    # a tiny bounded domain, so the entropy sum is exact micro-nats
    # over at most a few dozen cells). Shifts in this fingerprint are
    # a cheap early tokenizer-drift alarm.
    oracle="""
    WITH tl AS (
      SELECT source, CAST(len(tok) AS BIGINT) AS l
      FROM (
        SELECT source,
               unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                  x -> x <> '')) AS tok
        FROM documents
      )
    ),
    c AS (
      SELECT source, l, CAST(COUNT(*) AS BIGINT) AS c FROM tl GROUP BY 1, 2
    ),
    n AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY 1)
    SELECT c.source,
           CAST(COUNT(*) AS BIGINT) AS n_lengths,
           round(CAST(SUM(CAST(floor(round((CAST(c.c AS DOUBLE) / n.n)
                 * round(ln(CAST(n.n AS DOUBLE) / c.c), 6),
                 12) * 1000000000000 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 1000000000000.0, 6) AS length_entropy_nats
    FROM c JOIN n USING (source)
    GROUP BY c.source
    ORDER BY c.source
    """,
)


def _dtoklenentropy(spark, sf_dir):
    """Token-length entropy per source: one explode + grouped count on
    a (source, small-int) key, picounit entropy terms — the
    fingerprint whose drift says 'your tokenizer or your source
    changed' before any model does."""
    d = t(spark, sf_dir, "documents")
    tl = d.select("source", F.explode(tok_arr(F.col("text"))).alias("tok")).select(
        "source", F.length("tok").cast("long").alias("l")
    )
    c = tl.groupBy("source", "l").agg(F.count("*").cast("long").alias("c"))
    n = c.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    term = F.floor(
        F.round(
            (F.col("c").cast("double") / F.col("n"))
            * F.round(F.log(F.col("n").cast("double") / F.col("c")), 6),
            12,
        )
        * 1e12
        + 0.5
    ).cast("long")
    return (
        c.join(F.broadcast(n), "source")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_lengths"),
            F.round(F.sum(term).cast("double") / 1e12, 6).alias(
                "length_entropy_nats"
            ),
        )
        .orderBy("source")
    )


CATALOG["doc_token_length_entropy"].fn = _dtoklenentropy

register(
    "evt_stream_hll_now",
    # eighteenth streaming run: HyperLogLog cardinality as STREAMING
    # STATE — hll_sketch_agg over the user-id stream in complete mode
    # holds one bounded sketch row for any stream length (the distinct-
    # count twin of the CMS/KLL runs). Gated like the batch HLL family:
    # the oracle carries the exact distinct count and the PASS verdict
    # (|est - exact| <= 6.5% — four sigmas of lgConfigK=12's 1.6% rsd).
    oracle="""
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS within_bound
    FROM events
    """,
)


def _dstreamhll(spark, sf_dir):
    """Streaming HLL: one global streaming aggregate holds the
    mergeable sketch; the post-run probe reads the estimate from the
    sink and one batch distinct scores it. Streaming distinct-user
    dashboards with O(1) state — the exact side exists only for the
    gate."""
    schema = _events_stream_schema(ts_ntz=False)
    src = _stream_file_source(spark, sf_dir, "events.parquet", schema)
    sketch = src.select("user_id").agg(F.hll_sketch_agg("user_id").alias("__hll"))
    sink = _run_stream_to_memory(sketch, "evt_stream_hll_sink", "complete")
    est = sink.select(F.hll_sketch_estimate("__hll").alias("__est"))
    ev = t(spark, sf_dir, "events")
    exact = ev.agg(F.countDistinct("user_id").cast("long").alias("n_exact"))
    return exact.crossJoin(F.broadcast(est)).select(
        "n_exact",
        (
            F.abs(F.col("__est") - F.col("n_exact")).cast("double")
            <= F.lit(0.065) * F.col("n_exact")
        ).alias("within_bound"),
    )


CATALOG["evt_stream_hll_now"].fn = _dstreamhll


