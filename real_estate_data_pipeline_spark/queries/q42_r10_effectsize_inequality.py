"""Split from queries.py lines 28128-28649 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t, tok_arr
from .q15_curation_r3 import _HOURLY_TYPE_CENTS_CTE, _hourly_type_cents

# ===========================================================================
# round-10 wave 11: parametric effect size, per-segment inequality,
# peak factors, stopword density, price dispersion — fast exact wins.
# ===========================================================================

register(
    "ml_cohens_d_quantity",
    # the parametric twin of Cliff's delta: Cohen's d between returned
    # and delivered quantities with the pooled SD from exact integer
    # moment sums, plus Hedges' g small-sample correction factor
    # (1 - 3/(4*df - 1) — a rational, no gamma functions). One
    # conditional aggregate, one shared-order expression.
    oracle="""
    WITH g AS (
      SELECT CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n1,
             CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n2,
             CAST(SUM(CASE WHEN l_returnflag = 'R'
                           THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT)
                 AS s1,
             CAST(SUM(CASE WHEN l_returnflag = 'N'
                           THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT)
                 AS s2,
             CAST(SUM(CASE WHEN l_returnflag = 'R'
                           THEN CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS BIGINT)
                           ELSE 0 END) AS DOUBLE) AS q1,
             CAST(SUM(CASE WHEN l_returnflag = 'N'
                           THEN CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS BIGINT)
                           ELSE 0 END) AS DOUBLE) AS q2
      FROM lineitem WHERE l_returnflag IN ('R', 'N')
    )
    SELECT n1 AS n_r, n2 AS n_n,
           round(CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2, 6)
               AS mean_diff,
           round((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
                 / sqrt(((q1 - CAST(CAST(s1 AS HUGEINT) * s1 AS DOUBLE) / n1)
                         + (q2 - CAST(CAST(s2 AS HUGEINT) * s2 AS DOUBLE) / n2))
                        / (n1 + n2 - 2.0)), 6) AS cohens_d,
           round((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
                 / sqrt(((q1 - CAST(CAST(s1 AS HUGEINT) * s1 AS DOUBLE) / n1)
                         + (q2 - CAST(CAST(s2 AS HUGEINT) * s2 AS DOUBLE) / n2))
                        / (n1 + n2 - 2.0))
                 * (1.0 - 3.0 / (4.0 * (n1 + n2 - 2.0) - 1.0)), 6) AS hedges_g
    FROM g
    """,
)


def _dcohensd(spark, sf_dir):
    """Cohen's d + Hedges' g in ONE aggregate: all four moment sums
    come out of a single conditional pass and every downstream term is
    a shared-order expression over that 1-row frame."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag").isin("R", "N"))
    q = F.col("l_quantity").cast("long")
    qd = q.cast("decimal(18,0)")
    g = li.agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0))
        .cast("long")
        .alias("n2"),
        F.sum(F.when(F.col("l_returnflag") == "R", q).otherwise(0))
        .cast("long")
        .alias("s1"),
        F.sum(F.when(F.col("l_returnflag") == "N", q).otherwise(0))
        .cast("long")
        .alias("s2"),
        F.sum(
            F.when(F.col("l_returnflag") == "R", qd * q).otherwise(
                F.lit(0).cast("decimal(18,0)")
            )
        )
        .cast("double")
        .alias("q1"),
        F.sum(
            F.when(F.col("l_returnflag") == "N", qd * q).otherwise(
                F.lit(0).cast("decimal(18,0)")
            )
        )
        .cast("double")
        .alias("q2"),
    )
    mdiff = F.col("s1").cast("double") / F.col("n1") - F.col("s2").cast(
        "double"
    ) / F.col("n2")
    ssw = (
        F.col("q1")
        - (F.col("s1").cast("decimal(19,0)") * F.col("s1")).cast("double")
        / F.col("n1")
    ) + (
        F.col("q2")
        - (F.col("s2").cast("decimal(19,0)") * F.col("s2")).cast("double")
        / F.col("n2")
    )
    d = mdiff / F.sqrt(ssw / (F.col("n1") + F.col("n2") - 2.0))
    corr = 1.0 - 3.0 / (4.0 * (F.col("n1") + F.col("n2") - 2.0) - 1.0)
    return g.select(
        F.col("n1").alias("n_r"),
        F.col("n2").alias("n_n"),
        F.round(mdiff, 6).alias("mean_diff"),
        F.round(d, 6).alias("cohens_d"),
        F.round(d * corr, 6).alias("hedges_g"),
    )


CATALOG["ml_cohens_d_quantity"].fn = _dcohensd

register(
    "orders_gini_by_segment",
    # inequality WITHIN each market segment: the customer-revenue Gini
    # per mktsegment via the same exact rank identity as the global
    # report, with ranks partitioned by segment (deterministic ties by
    # custkey) — which segments are whale-driven and which are flat.
    oracle="""
    WITH cr AS (
      SELECT c.c_mktsegment AS seg, o.o_custkey AS ck,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
                 AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    rk AS (
      SELECT seg, cents,
             ROW_NUMBER() OVER (PARTITION BY seg ORDER BY cents, ck) AS i
      FROM cr
    )
    SELECT seg AS mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           round(CAST(SUM(cents) AS BIGINT) / 100.0, 2) AS segment_revenue,
           round(2.0 * CAST(SUM(CAST(i AS HUGEINT) * cents) AS DOUBLE)
                 / (CAST(COUNT(*) AS DOUBLE) * SUM(cents))
                 - (COUNT(*) + 1.0) / COUNT(*), 6) AS revenue_gini
    FROM rk GROUP BY seg
    ORDER BY seg
    """,
)


def _dsegmentgini(spark, sf_dir):
    """Per-segment Gini: one per-(segment, customer) aggregate, one
    segment-PARTITIONED rank (no global sort), one rollup — the
    inequality measure sliced by any dimension at GROUP BY cost."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cr = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"), F.col("o_custkey").alias("ck")
        )
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents")
        )
    )
    rk = cr.select(
        "seg",
        "cents",
        F.row_number()
        .over(Window.partitionBy("seg").orderBy("cents", "ck"))
        .alias("i"),
    )
    return (
        rk.groupBy("seg")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.round(F.sum("cents").cast("long") / 100.0, 2).alias(
                "segment_revenue"
            ),
            F.round(
                2.0
                * F.sum(F.col("i").cast("decimal(19,0)") * F.col("cents")).cast(
                    "double"
                )
                / (F.count("*").cast("double") * F.sum("cents"))
                - (F.count("*") + 1.0) / F.count("*"),
                6,
            ).alias("revenue_gini"),
        )
        .select(
            F.col("seg").alias("mktsegment"),
            "n_customers",
            "segment_revenue",
            "revenue_gini",
        )
        .orderBy("mktsegment")
    )


CATALOG["orders_gini_by_segment"].fn = _dsegmentgini

register(
    "evt_peak_to_mean_ratio",
    # capacity planning's first number: per event type, the peak hourly
    # load over the mean hourly load, and WHICH hour peaked
    # (deterministic argmax — earliest peak hour wins ties). Exact
    # integer cents; one division.
    oracle=f"""
    WITH {_HOURLY_TYPE_CENTS_CTE},
    g AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_hours,
             CAST(MAX(cents) AS BIGINT) AS peak,
             CAST(SUM(cents) AS BIGINT) AS total
      FROM obs GROUP BY event_type
    ),
    pk AS (
      SELECT o.event_type,
             strftime(MIN(o.h), '%Y-%m-%d %H:%M:%S') AS peak_hour
      FROM obs o JOIN g ON g.event_type = o.event_type AND o.cents = g.peak
      GROUP BY o.event_type
    )
    SELECT g.event_type, g.n_hours,
           round(g.peak / 100.0, 2) AS peak_value,
           round(CAST(g.total AS DOUBLE) / g.n_hours / 100.0, 6) AS mean_value,
           round(CAST(g.peak AS DOUBLE) * g.n_hours / g.total, 6)
               AS peak_to_mean,
           pk.peak_hour
    FROM g JOIN pk USING (event_type)
    ORDER BY g.event_type
    """,
)


def _dpeakmean(spark, sf_dir):
    """Peak-to-mean per type: one hourly rollup, one per-type moment
    aggregate, one equi-join back for the argmax hour — the burst
    headroom number with zero windows."""
    obs = _hourly_type_cents(spark, sf_dir).localCheckpoint(eager=False)
    g = obs.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_hours"),
        F.max("cents").cast("long").alias("peak"),
        F.sum("cents").cast("long").alias("total"),
    ).localCheckpoint(eager=False)
    pk = (
        obs.join(
            F.broadcast(g.select("event_type", "peak")),
            ["event_type"],
        )
        .filter(F.col("cents") == F.col("peak"))
        .groupBy("event_type")
        .agg(
            F.date_format(F.min("h"), "yyyy-MM-dd HH:mm:ss").alias("peak_hour")
        )
    )
    return (
        g.join(pk, "event_type")
        .select(
            "event_type",
            "n_hours",
            F.round(F.col("peak") / 100.0, 2).alias("peak_value"),
            F.round(
                F.col("total").cast("double") / F.col("n_hours") / 100.0, 6
            ).alias("mean_value"),
            F.round(
                F.col("peak").cast("double") * F.col("n_hours") / F.col("total"), 6
            ).alias("peak_to_mean"),
            "peak_hour",
        )
        .orderBy("event_type")
    )


CATALOG["evt_peak_to_mean_ratio"].fn = _dpeakmean

register(
    "doc_stopword_density_by_lang",
    # a text-quality feature with a built-in sanity check: the density
    # of each language's OWN stopwords in documents labeled that
    # language (real text has high own-stopword density; word salads
    # and mislabeled docs don't). The stopword list is the lang-ID
    # tier's seed list, single-sourced.
    oracle="""
    WITH tk AS (
      SELECT lang,
             unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                x -> x <> '')) AS tok
      FROM documents WHERE lang IN ('en', 'es', 'de', 'fr')
    ),
    f AS (
      SELECT lang,
             CASE WHEN (lang = 'en' AND tok IN ('the','and','of','to','in','a','is'))
                    OR (lang = 'es' AND tok IN ('el','la','de','que','y','los','es'))
                    OR (lang = 'de' AND tok IN ('der','die','und','das','ein','ist','nicht'))
                    OR (lang = 'fr' AND tok IN ('le','la','et','les','des','un','est'))
                  THEN 1 ELSE 0 END AS hit
      FROM tk
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(hit) AS BIGINT) AS n_stopwords,
           round(CAST(SUM(hit) AS DOUBLE) / COUNT(*), 6) AS stopword_density
    FROM f GROUP BY lang
    ORDER BY lang
    """,
)


def _dstopdensity(spark, sf_dir):
    """Own-language stopword density: one explode with a per-lang
    membership flag (the lang-ID seed lists, single-sourced from
    ops/text.LANG_STOPWORDS), one rollup — the cheap 'is this corpus
    real language' gauge."""
    from ..ops.text import LANG_STOPWORDS

    d = t(spark, sf_dir, "documents").filter(
        F.col("lang").isin(*LANG_STOPWORDS.keys())
    )
    tk = d.select("lang", F.explode(tok_arr(F.col("text"))).alias("tok"))
    hit = F.lit(False)
    for lg, words in LANG_STOPWORDS.items():
        hit = hit | ((F.col("lang") == lg) & F.col("tok").isin(*words))
    f = tk.select("lang", F.when(hit, 1).otherwise(0).alias("hit"))
    return (
        f.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("hit").cast("long").alias("n_stopwords"),
            F.round(F.sum("hit").cast("double") / F.count("*"), 6).alias(
                "stopword_density"
            ),
        )
        .orderBy("lang")
    )


CATALOG["doc_stopword_density_by_lang"].fn = _dstopdensity

register(
    "part_brand_price_dispersion",
    # price-consistency audit per brand: mean, SD (from exact cent
    # moments) and the coefficient of variation of retail prices —
    # which brands price tightly and which are all over the map.
    oracle="""
    WITH x AS (
      SELECT p_brand,
             CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc
      FROM part
    ),
    g AS (
      SELECT p_brand,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(pc) AS BIGINT) AS s,
             CAST(SUM(CAST(pc AS HUGEINT) * pc) AS DOUBLE) AS q
      FROM x GROUP BY p_brand
    )
    SELECT p_brand, n AS n_parts,
           round(CAST(s AS DOUBLE) / n / 100.0, 6) AS mean_price,
           round(sqrt((n * q - CAST(CAST(s AS HUGEINT) * s AS DOUBLE))
                      / (CAST(n AS DOUBLE) * (n - 1))) / 100.0, 6) AS sd_price,
           round(sqrt((n * q - CAST(CAST(s AS HUGEINT) * s AS DOUBLE))
                      / (CAST(n AS DOUBLE) * (n - 1)))
                 / (CAST(s AS DOUBLE) / n), 6) AS price_cv
    FROM g ORDER BY p_brand
    """,
)


def _dbranddispersion(spark, sf_dir):
    """Brand price dispersion: one grouped moment aggregate over exact
    integer cents, SD recomputed from the sums (never the engines'
    accumulators) — the per-dimension variance audit at GROUP BY
    cost."""
    p = t(spark, sf_dir, "part")
    pc = (F.col("p_retailprice").cast(DEC) * 100).cast("long")
    pcd = pc.cast("decimal(18,0)")
    g = p.groupBy("p_brand").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(pc).cast("long").alias("s"),
        F.sum(pcd * pc).cast("double").alias("q"),
    )
    var = (
        F.col("n") * F.col("q")
        - (F.col("s").cast("decimal(19,0)") * F.col("s")).cast("double")
    ) / (F.col("n").cast("double") * (F.col("n") - 1))
    return g.select(
        "p_brand",
        F.col("n").alias("n_parts"),
        F.round(F.col("s").cast("double") / F.col("n") / 100.0, 6).alias(
            "mean_price"
        ),
        F.round(F.sqrt(var) / 100.0, 6).alias("sd_price"),
        F.round(F.sqrt(var) / (F.col("s").cast("double") / F.col("n")), 6).alias(
            "price_cv"
        ),
    ).orderBy("p_brand")


CATALOG["part_brand_price_dispersion"].fn = _dbranddispersion

register(
    "doc_token_shape_profile",
    # cheap text-quality fingerprints per source: the share of purely
    # numeric tokens, the share containing any digit, and the share of
    # single-character tokens — three regex flags folded into ONE
    # grouped aggregate. Corpora that drift toward tables/IDs/noise
    # move these before any model notices.
    oracle="""
    WITH tk AS (
      SELECT source,
             unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                x -> x <> '')) AS tok
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           round(CAST(SUM(CASE WHEN regexp_matches(tok, '^[0-9]+$')
                               THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
               AS numeric_share,
           round(CAST(SUM(CASE WHEN regexp_matches(tok, '[0-9]')
                               THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
               AS has_digit_share,
           round(CAST(SUM(CASE WHEN len(tok) = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS single_char_share
    FROM tk GROUP BY source
    ORDER BY source
    """,
)


def _dtokenshape(spark, sf_dir):
    """Token-shape profile: one explode, three JVM-side regex flags,
    one rollup — the quality features a curation filter thresholds on,
    with no UDF anywhere."""
    d = t(spark, sf_dir, "documents")
    tk = d.select("source", F.explode(tok_arr(F.col("text"))).alias("tok"))
    return (
        tk.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(
                F.sum(
                    F.when(F.col("tok").rlike("^[0-9]+$"), 1).otherwise(0)
                ).cast("double")
                / F.count("*"),
                6,
            ).alias("numeric_share"),
            F.round(
                F.sum(F.when(F.col("tok").rlike("[0-9]"), 1).otherwise(0)).cast(
                    "double"
                )
                / F.count("*"),
                6,
            ).alias("has_digit_share"),
            F.round(
                F.sum(F.when(F.length("tok") == 1, 1).otherwise(0)).cast("double")
                / F.count("*"),
                6,
            ).alias("single_char_share"),
        )
        .orderBy("source")
    )


CATALOG["doc_token_shape_profile"].fn = _dtokenshape

register(
    "evt_weekend_weekday_lift",
    # the simplest seasonality split: per event type, weekend vs
    # weekday mean hourly value and their ratio. Day-of-week uses the
    # ISO convention on both sides (DuckDB isodow-1 == Spark weekday,
    # 0 = Monday), so the split can never drift by an engine's
    # week-start choice; exact integer cents until the divisions.
    oracle=f"""
    WITH {_HOURLY_TYPE_CENTS_CTE},
    f AS (
      SELECT event_type,
             CASE WHEN isodow(h) - 1 >= 5 THEN 1 ELSE 0 END AS wknd, cents
      FROM obs
    )
    SELECT event_type,
           CAST(SUM(1 - wknd) AS BIGINT) AS n_weekday_hours,
           CAST(SUM(wknd) AS BIGINT) AS n_weekend_hours,
           round(CAST(SUM(CASE WHEN wknd = 0 THEN cents ELSE 0 END) AS DOUBLE)
                 / SUM(1 - wknd) / 100.0, 6) AS weekday_hourly_mean,
           round(CAST(SUM(CASE WHEN wknd = 1 THEN cents ELSE 0 END) AS DOUBLE)
                 / SUM(wknd) / 100.0, 6) AS weekend_hourly_mean,
           round((CAST(SUM(CASE WHEN wknd = 1 THEN cents ELSE 0 END) AS DOUBLE)
                  / SUM(wknd))
                 / (CAST(SUM(CASE WHEN wknd = 0 THEN cents ELSE 0 END) AS DOUBLE)
                    / SUM(1 - wknd)), 6) AS weekend_lift
    FROM f GROUP BY event_type
    ORDER BY event_type
    """,
)


def _dweekendlift(spark, sf_dir):
    """Weekend lift per type: the hourly frame gains one ISO-weekday
    flag and ONE conditional aggregate carries both splits — the
    schedule-vs-leisure signal every ops dashboard wants, at rollup
    cost."""
    obs = _hourly_type_cents(spark, sf_dir)
    f = obs.select(
        "event_type",
        F.when(F.weekday("h") >= 5, 1).otherwise(0).alias("wknd"),
        "cents",
    )
    wkd_sum = F.sum(F.when(F.col("wknd") == 0, F.col("cents")).otherwise(0)).cast(
        "double"
    )
    wke_sum = F.sum(F.when(F.col("wknd") == 1, F.col("cents")).otherwise(0)).cast(
        "double"
    )
    n_wkd = F.sum(1 - F.col("wknd"))
    n_wke = F.sum(F.col("wknd"))
    return (
        f.groupBy("event_type")
        .agg(
            n_wkd.cast("long").alias("n_weekday_hours"),
            n_wke.cast("long").alias("n_weekend_hours"),
            F.round(wkd_sum / n_wkd / 100.0, 6).alias("weekday_hourly_mean"),
            F.round(wke_sum / n_wke / 100.0, 6).alias("weekend_hourly_mean"),
            F.round((wke_sum / n_wke) / (wkd_sum / n_wkd), 6).alias("weekend_lift"),
        )
        .orderBy("event_type")
    )


CATALOG["evt_weekend_weekday_lift"].fn = _dweekendlift


