"""Split from queries.py lines 13964-14362 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, _scratch, dsum, register, t

# ===========================================================================
# round-7 additions: lakehouse composition / data-management reports
# ===========================================================================

register(
    "scd2_asof_feature_join",
    # THE feature-store training-data query: every event joined to the
    # dimension VERSION valid at event time (leakage-free features —
    # an event must never see attributes from its future). Two pinned
    # SCD2 merges (the scd2_point_in_time setup) produce the version
    # table; the oracle derives the identical versions directly from
    # the deterministic merge semantics. [valid_from, valid_to) on
    # both sides; users with no version yet roll up as UNMATCHED.
    oracle="""
    WITH v1 AS (
      SELECT c_custkey, c_mktsegment AS seg,
             TIMESTAMP '2024-01-01 00:00:00' AS vf,
             CASE WHEN c_custkey % 2 = 0 AND c_custkey % 5 = 0
                  THEN TIMESTAMP '2024-01-02 00:00:00' END AS vt
      FROM customer WHERE c_custkey % 3 <> 0
    ),
    v2 AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 5 = 0 THEN 'CHANGED' ELSE c_mktsegment END AS seg,
             TIMESTAMP '2024-01-02 00:00:00' AS vf,
             CAST(NULL AS TIMESTAMP) AS vt
      FROM customer
      WHERE c_custkey % 2 = 0 AND (c_custkey % 3 = 0 OR c_custkey % 5 = 0)
    ),
    vers AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2),
    j AS (
      SELECT COALESCE(v.seg, 'UNMATCHED') AS segment, e.value
      FROM events e LEFT JOIN vers v
        ON v.c_custkey = e.user_id
       AND e.ts >= v.vf AND (v.vt IS NULL OR e.ts < v.vt)
    )
    SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM j GROUP BY segment ORDER BY segment
    """,
    bench=True,
)


def _dscd2asofjoin(spark, sf_dir):
    """As-of feature join against the SCD2 store: replay the two
    pinned merges (scd2_point_in_time's setup), read the FULL snapshot
    (closed versions included — that is what makes the store a feature
    store), and equi-join events on the key with the validity-window
    residual — each event matches at most one version, the one valid
    at event time. Composes Scd2Table.merge + read + the as-of shape
    into the leakage-free training-data query; at 100 TB the version
    table is dimension-sized and broadcasts."""
    import shutil

    from ..io.scd2 import Scd2Table

    base = _scratch("redp_scd2_asof_feature_gate")
    shutil.rmtree(base, ignore_errors=True)
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
    day1 = c.filter(F.col("c_custkey") % 3 != 0)
    day2 = c.filter(F.col("c_custkey") % 2 == 0).withColumn(
        "c_mktsegment",
        F.when(F.col("c_custkey") % 5 == 0, F.lit("CHANGED")).otherwise(
            F.col("c_mktsegment")
        ),
    )
    tbl = Scd2Table(
        spark, base, key="c_custkey", tracked=["c_mktsegment"], order_col="c_acctbal"
    )
    tbl.merge(day1, batch_ts=F.to_timestamp(F.lit("2024-01-01 00:00:00")))
    tbl.merge(day2, batch_ts=F.to_timestamp(F.lit("2024-01-02 00:00:00")))
    vers = tbl.read().select(
        "c_custkey",
        F.col("c_mktsegment").alias("seg"),
        F.col("valid_from").cast("timestamp_ntz").alias("vf"),
        F.col("valid_to").cast("timestamp_ntz").alias("vt"),
    )
    ev = t(spark, sf_dir, "events")
    j = ev.join(
        F.broadcast(vers),
        (F.col("c_custkey") == F.col("user_id"))
        & (F.col("ts") >= F.col("vf"))
        & (F.col("vt").isNull() | (F.col("ts") < F.col("vt"))),
        "left",
    ).select(F.coalesce(F.col("seg"), F.lit("UNMATCHED")).alias("segment"), "value")
    return (
        j.groupBy("segment")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            dsum("value", "total_value"),
        )
        .orderBy("segment")
    )


CATALOG["scd2_asof_feature_join"].fn = _dscd2asofjoin

register(
    "dq_benford_first_digit",
    # Benford's-law audit of order totals (the fraud/synthetic-data
    # smell test): observed first-significant-digit counts vs the
    # log10(1+1/d) expectation, chi-square statistic assembled from
    # exact integer counts and identical double literals.
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(o_totalprice * 100 AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit
      FROM orders WHERE o_totalprice > 0
    ),
    obs AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM obs)
    SELECT obs.digit, obs.n,
           round(CAST(obs.n AS DOUBLE) / tot.t, 6) AS observed_p,
           round(log10(1.0 + 1.0 / obs.digit), 6) AS benford_p,
           round(((CAST(obs.n AS DOUBLE) / tot.t - log10(1.0 + 1.0 / obs.digit))
                  * (CAST(obs.n AS DOUBLE) / tot.t - log10(1.0 + 1.0 / obs.digit)))
                 / log10(1.0 + 1.0 / obs.digit) * tot.t, 6) AS chi2_term
    FROM obs, tot
    ORDER BY obs.digit
    """,
)


def _dbenford(spark, sf_dir):
    """Benford first-digit audit: totals scale to exact integer cents,
    the first digit is a string head (no float log tricks — identical
    on any engine), one 9-group aggregate + a 1-row total broadcast.
    The distribution-shape check that catches fabricated numeric
    columns before they poison a model."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    d = o.select(
        F.substring(
            (F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    obs = d.groupBy("digit").agg(F.count("*").cast("long").alias("n"))
    tot = obs.agg(F.sum("n").cast("long").alias("__t"))
    obs_p = F.col("n").cast("double") / F.col("__t")
    ben_p = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.round(obs_p, 6).alias("observed_p"),
            F.round(ben_p, 6).alias("benford_p"),
            F.round(
                ((obs_p - ben_p) * (obs_p - ben_p)) / ben_p * F.col("__t"), 6
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


CATALOG["dq_benford_first_digit"].fn = _dbenford

register(
    "dq_duplicate_key_audit",
    # key-multiplicity audit across the schema's three key shapes:
    # a true PK (orders), a dimension PK (customer), and a composite
    # key (lineitem orderkey+linenumber). One aggregate per table,
    # unioned — the referential-quality report before any MERGE is
    # trusted. Pure integers.
    oracle="""
    WITH ok AS (
      SELECT 'orders.o_orderkey' AS key_name,
             CAST(SUM(m) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(MAX(m) AS BIGINT) AS max_multiplicity,
             CAST(COUNT(CASE WHEN m > 1 THEN 1 END) AS BIGINT) AS n_dup_keys
      FROM (SELECT o_orderkey, COUNT(*) AS m FROM orders GROUP BY 1)
    ),
    ck AS (
      SELECT 'customer.c_custkey', CAST(SUM(m) AS BIGINT),
             CAST(COUNT(*) AS BIGINT), CAST(MAX(m) AS BIGINT),
             CAST(COUNT(CASE WHEN m > 1 THEN 1 END) AS BIGINT)
      FROM (SELECT c_custkey, COUNT(*) AS m FROM customer GROUP BY 1)
    ),
    lk AS (
      SELECT 'lineitem.(o_orderkey,l_linenumber)', CAST(SUM(m) AS BIGINT),
             CAST(COUNT(*) AS BIGINT), CAST(MAX(m) AS BIGINT),
             CAST(COUNT(CASE WHEN m > 1 THEN 1 END) AS BIGINT)
      FROM (SELECT l_orderkey, l_linenumber, COUNT(*) AS m
            FROM lineitem GROUP BY 1, 2)
    )
    SELECT * FROM ok UNION ALL SELECT * FROM ck UNION ALL SELECT * FROM lk
    ORDER BY key_name
    """,
)


def _ddupkeyaudit(spark, sf_dir):
    """Key-multiplicity audit: per candidate key, one count aggregate
    over the key groups (n_rows from SUM of multiplicities, distinct
    keys, worst multiplicity, dup-key count) — three cheap aggregates
    unioned into the report a lakehouse MERGE precondition check
    reads. The per-key aggregate output is key-cardinality-sized, so
    the audit scales with the keys, not the facts."""

    def audit(df, cols, label):
        g = df.groupBy(*cols).agg(F.count("*").alias("m"))
        return g.agg(
            F.lit(label).alias("key_name"),
            F.sum("m").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_keys"),
            F.max("m").cast("long").alias("max_multiplicity"),
            F.count(F.when(F.col("m") > 1, 1)).cast("long").alias("n_dup_keys"),
        )

    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    li = t(spark, sf_dir, "lineitem")
    return (
        audit(o, ["o_orderkey"], "orders.o_orderkey")
        .unionByName(audit(c, ["c_custkey"], "customer.c_custkey"))
        .unionByName(
            audit(
                li,
                ["l_orderkey", "l_linenumber"],
                "lineitem.(o_orderkey,l_linenumber)",
            )
        )
        .orderBy("key_name")
    )


CATALOG["dq_duplicate_key_audit"].fn = _ddupkeyaudit

register(
    "dq_quantile_normalized_features",
    # quantile normalization of a skewed feature (the rank-Gaussian /
    # percentile-uniform transform a trainer applies to heavy-tailed
    # inputs): percent_rank of o_totalprice within each market segment
    # (identical definition on both engines, custkey tie-break via the
    # orderkey), bucketed to deciles for the audit view.
    oracle="""
    WITH r AS (
      SELECT c.c_mktsegment,
             percent_rank() OVER (PARTITION BY c.c_mktsegment
                                  ORDER BY o.o_totalprice, o.o_orderkey) AS pr
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    )
    SELECT c_mktsegment, CAST(least(floor(pr * 10), 9) AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(MIN(pr), 6) AS min_pr, round(MAX(pr), 6) AS max_pr
    FROM r GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)


def _dquantnorm(spark, sf_dir):
    """Quantile (rank) normalization per segment: one window shuffle
    partitioned by segment, percent_rank with a full deterministic
    order, decile bucketing. The transform itself is the pr column —
    the decile rollup is the audit that the transform is uniform (each
    decile ~10%), which is what the oracle verifies exactly."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("o_totalprice", "o_orderkey")
    r = (
        o.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select("c_mktsegment", "o_totalprice", "o_orderkey")
        .withColumn("pr", F.percent_rank().over(w))
    )
    return (
        r.groupBy(
            "c_mktsegment",
            F.least(F.floor(F.col("pr") * 10), F.lit(9)).cast("long").alias("decile"),
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.min("pr"), 6).alias("min_pr"),
            F.round(F.max("pr"), 6).alias("max_pr"),
        )
        .orderBy("c_mktsegment", "decile")
    )


CATALOG["dq_quantile_normalized_features"].fn = _dquantnorm

register(
    "dq_profile_timeline_weekly",
    # schema/quality drift as a TIMELINE (dq_schema_profile_diff is a
    # two-point diff): weekly profile of the event stream — volume,
    # null rate of the value column, distinct types and users, exact
    # cents mean. The per-source profile a drift monitor charts; a
    # step in any series localizes an upstream change to a week.
    oracle="""
    SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(CASE WHEN value IS NULL THEN 1 END) AS BIGINT) AS n_null_value,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           round(CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
                      AS DOUBLE) / 100.0 / COUNT(value), 6) AS mean_value
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
)


def _dprofiletimeline(spark, sf_dir):
    """Weekly profile timeline: ONE aggregate pass computes the whole
    drift chart (counts, null rate, distinct cardinalities, exact-cents
    mean per week) — the single-pass-profile convention of the dq_*
    family applied over time buckets instead of sources."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias(
                "week_start"
            )
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.count(F.when(F.col("value").isNull(), 1))
            .cast("long")
            .alias("n_null_value"),
            F.countDistinct("event_type").cast("long").alias("n_types"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.round(
                (F.sum(F.col("value").cast(DEC)) * 100)
                .cast("long")
                .cast("double")
                / 100.0
                / F.count("value"),
                6,
            ).alias("mean_value"),
        )
        .orderBy("week_start")
    )


CATALOG["dq_profile_timeline_weekly"].fn = _dprofiletimeline

register(
    "io_partition_rows_skew_report",
    # partition-size skew report for a date-partitioned fact: rows per
    # day, share of total, and the skew factor (partition / mean) that
    # flags the hot partitions a writer should salt or split. Exact
    # integers + identical divisions.
    oracle="""
    WITH p AS (
      SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS part_key,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM orders GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS t,
                   CAST(COUNT(*) AS BIGINT) AS np FROM p)
    SELECT p.part_key, p.n_rows,
           round(CAST(p.n_rows AS DOUBLE) / tot.t, 6) AS share,
           round(CAST(p.n_rows AS DOUBLE) / (CAST(tot.t AS DOUBLE) / tot.np), 6)
             AS skew_factor
    FROM p, tot
    ORDER BY p.n_rows DESC, p.part_key
    LIMIT 20
    """,
)


def _dpartskew(spark, sf_dir):
    """Partition-skew report over the natural date partitioning: one
    aggregate to partition-key cardinality, a 1-row total broadcast,
    top-20 hottest partitions. The report that decides salting /
    AQE-skew-join thresholds before a 100 TB write."""
    o = t(spark, sf_dir, "orders")
    p = o.groupBy(
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias(
            "part_key"
        )
    ).agg(F.count("*").cast("long").alias("n_rows"))
    tot = p.agg(
        F.sum("n_rows").cast("long").alias("__t"),
        F.count("*").cast("long").alias("__np"),
    )
    return (
        p.crossJoin(F.broadcast(tot))
        .select(
            "part_key",
            "n_rows",
            F.round(F.col("n_rows").cast("double") / F.col("__t"), 6).alias("share"),
            F.round(
                F.col("n_rows").cast("double")
                / (F.col("__t").cast("double") / F.col("__np")),
                6,
            ).alias("skew_factor"),
        )
        .orderBy(F.desc("n_rows"), "part_key")
        .limit(20)
    )


CATALOG["io_partition_rows_skew_report"].fn = _dpartskew


