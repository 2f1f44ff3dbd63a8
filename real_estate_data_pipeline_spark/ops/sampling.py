"""Deterministic, engine-reproducible sampling for corpus curation.

``df.sample``/``sampleBy`` draw from Spark's per-partition RNG: the
result changes with partitioning, so a re-run on repartitioned data
(or another engine) selects different rows — useless for a training
corpus that must be reproducible and auditable. Hash sampling decides
membership from the ROW KEY alone: ``uniform01(key) < fraction``,
where uniform01 is the first 8 hex chars of sha2-256 scaled to [0,1).
Same key + same salt => same decision, on any engine, any partitioning,
any day. The salt gives independent draws (new salt = fresh sample, and
disjoint salts give disjoint-enough splits for train/eval carving).

Everything is a scalar Column expression — filters stay JVM-side and
push down with the rest of the plan. DuckDB oracle equivalent:
``('0x' || substr(sha256(key || salt), 1, 8))::UBIGINT / 4294967296.0``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCALE = 4294967296.0  # 2^32: first 8 hex chars span [0, 2^32)


def hash_uniform01(key: Column, salt: str = "") -> Column:
    """Deterministic uniform [0,1) from a key column (+ salt)."""
    h = F.conv(
        F.substring(F.sha2(F.concat(key.cast("string"), F.lit(salt)), 256), 1, 8),
        16,
        10,
    ).cast("bigint")
    return h / F.lit(_SCALE)


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, membership decided by the key hash."""
    return df.filter(hash_uniform01(F.col(key_col), salt) < F.lit(float(fraction)))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum keep fractions (e.g. downsample an overrepresented
    language): one scalar CASE over the strata column, no shuffle, no
    per-stratum jobs (``sampleBy`` also samples in one pass but is not
    reproducible across engines/partitionings)."""
    frac = F.lit(float(default))
    for value, f in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == value, F.lit(float(f))).otherwise(frac)
    return df.filter(hash_uniform01(F.col(key_col), salt) < frac)


def hash_split(
    df: DataFrame, key_col: str, weights: list[float], salt: str = ""
) -> list[DataFrame]:
    """Disjoint, exhaustive train/eval/test splits from ONE hash draw:
    row r lands in split i iff uniform01(r) falls in i's cumulative
    band. Unlike ``randomSplit`` the assignment is stable under
    re-partitioning and re-runs."""
    total = sum(weights)
    u = hash_uniform01(F.col(key_col), salt)
    splits, lo = [], 0.0
    for i, w in enumerate(weights):
        hi = lo + w / total
        upper = u < F.lit(hi) if i < len(weights) - 1 else F.lit(True)
        splits.append(df.filter((u >= F.lit(lo)) & upper))
        lo = hi
    return splits


def shuffled_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int | None = None,
    salt: str = "shard",
    target_rows_per_shard: int | None = None,
    max_rows_per_task: int | None = 8_000_000,
    n_sub: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle into shards — the training-export
    primitive: SGD wants examples in pseudo-random order, and a 100 TB
    corpus cannot be orderBy(rand())-ed (non-reproducible AND a full
    global sort). Shard assignment AND within-shard position both
    derive from sha2 hash draws of the id, so the export is
    bit-reproducible across runs/engines and shards are balanced in
    expectation.

    Scale safety — a naive ``Window.partitionBy(shard)`` rank forces
    each whole shard through ONE task (8 shards over 100 TB = 12.5 TB
    per task: a scale-killer), so the rank runs TWO-LEVEL: each shard
    splits into ``n_sub`` sub-buckets by the leading bits of the
    position hash, rows rank within (shard, sub), and a broadcast of
    per-(shard, sub) counts supplies the offset of every sub-bucket.
    Because the sub-bucket is a monotone prefix of the same position
    draw that orders rows, offset + local rank IS the global per-shard
    rank — ``pos`` is bit-identical to the single-window result (the
    DuckDB oracle for the gate query proves this on the two-level
    path). Extra cost: one count per (shard, sub) — a partial-agg pass
    over ~n_shards x n_sub rows — and a broadcast join; no task ever
    sorts more than ~``max_rows_per_task`` rows.

    Sizing: pass ``n_shards`` directly or let it derive from
    ``target_rows_per_shard``; ``n_sub`` derives from
    ``max_rows_per_task`` (both derivations cost one count()). Set
    ``max_rows_per_task=None`` to force the legacy single-window path.

    Adds (shard int, pos bigint). Write with
    ``write_parquet(out, path, partition_by=["shard"])`` and trainers
    stream shard files in pos order; re-shuffling between epochs is a
    new ``salt``, not a new data copy."""
    import math

    from pyspark.sql import Window

    n_total: int | None = None
    if n_shards is None:
        if target_rows_per_shard is None:
            raise ValueError("pass n_shards or target_rows_per_shard")
        n_total = df.count()
        n_shards = max(1, math.ceil(n_total / target_rows_per_shard))
    if n_sub is None:
        if max_rows_per_task is None:
            n_sub = 1
        else:
            if n_total is None:
                n_total = df.count()
            n_sub = max(1, math.ceil(n_total / n_shards / max_rows_per_task))

    u = hash_uniform01(F.col(id_col), salt)
    # u = h/2^32 with h < 2^32 exact: u*n stays exact in a double for
    # any sane shard count, so floor() is engine-independent
    shard = F.floor(u * n_shards).cast("int")
    pos_u = hash_uniform01(F.col(id_col), salt + ":pos")

    if n_sub <= 1:
        w = Window.partitionBy("shard").orderBy(pos_u, F.col(id_col))
        return df.withColumn("shard", shard).withColumn(
            "pos", F.row_number().over(w).cast("bigint")
        )

    # two-level: sub = floor(pos_u * n_sub) is monotone in pos_u, and
    # equal pos_u always lands in the same sub, so ordering by
    # (sub, pos_u, id) == ordering by (pos_u, id)
    tagged = (
        df.withColumn("shard", shard)
        .withColumn("__pu", pos_u)
        .withColumn("__sub", F.floor(F.col("__pu") * n_sub).cast("int"))
    )
    offsets = (
        tagged.groupBy("shard", "__sub")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__n").over(
                    Window.partitionBy("shard")
                    .orderBy("__sub")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("shard", "__sub", "__off")
    )
    w = Window.partitionBy("shard", "__sub").orderBy("__pu", F.col(id_col))
    return (
        tagged.join(F.broadcast(offsets), ["shard", "__sub"])
        .withColumn(
            "pos", (F.col("__off") + F.row_number().over(w)).cast("bigint")
        )
        .drop("__pu", "__sub", "__off")
        .select(*df.columns, "shard", "pos")
    )


def temperature_mix(
    df: DataFrame,
    key_col: str,
    group_col: str,
    n_target: int,
    alpha: float = 0.7,
    salt: str = "mix",
) -> DataFrame:
    """Temperature-based dataset mixing (the Pile / multilingual-LM
    rebalancing rule): group g receives a share proportional to
    ``n_g^alpha`` of the ``n_target`` output rows — alpha=1 keeps the
    natural (size-proportional) mix, alpha=0 gives every group equal
    share, the usual 0.5-0.8 range lifts small sources without letting
    a giant one dominate. WHICH rows fill each group's quota is the
    deterministic sha2 hash draw (smallest draws win, ties on the
    key), so the mix replays bit-identically across runs and engines.

    Plan: one tiny group-count aggregate -> per-group targets (window
    over the group-count frame, broadcast back), one rank window per
    group on the hash draw. The weight rounds to 6 dp before the share
    division (pow is libm; the rounding is what lets a SQL engine
    reproduce the quota exactly).
    Quota rounding: each group's quota rounds independently
    (floor(share*n+0.5), the engine-portable convention the oracle
    replicates), so the output size can deviate from ``n_target`` by up
    to ~n_groups/2 rows and a group smaller than its quota under-fills
    silently. A largest-remainder correction would pin the total but
    break the per-group closed form both engines share.
    """
    from pyspark.sql import Window

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    w = F.round(F.pow(F.col("__n").cast("double"), F.lit(float(alpha))), 6)
    # group-count frame: one row per group, bounded by construction
    # (allowlisted in the tests/test_plans.py global-window lint)
    tot = F.sum(w).over(Window.partitionBy())
    targets = counts.select(
        group_col,
        F.floor(w / tot * F.lit(float(n_target)) + F.lit(0.5))
        .cast("int")
        .alias("__t"),
    )
    u = hash_uniform01(F.col(key_col), salt)
    rn = F.row_number().over(
        Window.partitionBy(group_col).orderBy(u.asc(), F.col(key_col).asc())
    )
    return (
        df.withColumn("__rn", rn)
        .join(F.broadcast(targets), group_col)
        .filter(F.col("__rn") <= F.col("__t"))
        .drop("__rn", "__t")
    )


def temperature_mix_tokens(
    df: DataFrame,
    key_col: str,
    group_col: str,
    token_col: str,
    n_target_tokens: int,
    alpha: float = 0.7,
    salt: str = "mixtok",
) -> DataFrame:
    """:func:`temperature_mix` with quotas in TOKENS, not rows — the
    budget trainers actually plan against: group g's share of the
    ``n_target_tokens`` budget is proportional to ``T_g^alpha`` where
    ``T_g`` is the group's total token mass, and the quota is filled
    GREEDILY in deterministic hash-draw order — a document is kept while
    the group's running token sum (inclusive of the document) stays
    within quota, so a long document that would overflow the budget is
    skipped along with everything after it.

    Plan: one tiny token-mass aggregate (one row per group; window over
    that bounded frame), broadcast targets, one running-sum window per
    group on the hash draw — the same two-shuffle shape as the row
    variant. pow() is libm, so the weight rounds to 6 dp before the
    share division; quota = floor(share * budget + 0.5) BIGINT; every
    comparison after that is exact integer arithmetic, identically on
    both engines."""
    from pyspark.sql import Window

    counts = df.groupBy(group_col).agg(F.sum(token_col).alias("__tg"))
    w = F.round(F.pow(F.col("__tg").cast("double"), F.lit(float(alpha))), 6)
    # group-count frame: one row per group, bounded by construction
    # (allowlisted in the tests/test_plans.py global-window lint)
    tot = F.sum(w).over(Window.partitionBy())
    targets = counts.select(
        group_col,
        F.floor(w / tot * F.lit(float(n_target_tokens)) + F.lit(0.5))
        .cast("long")
        .alias("__q"),
    )
    u = hash_uniform01(F.col(key_col), salt)
    cum = F.sum(token_col).over(
        Window.partitionBy(group_col)
        .orderBy(u.asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.withColumn("__cum", cum)
        .join(F.broadcast(targets), group_col)
        .filter(F.col("__cum") <= F.col("__q"))
        .drop("__cum", "__q")
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: Column | str,
    k: int,
    strata: list[str] | None = None,
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-Res, derandomized): each row's priority is
    ``ln(u)/w`` with ``u`` the sha2 hash draw of its key — maximizing
    it is equivalent to maximizing ``u^(1/w)``, so the top-k have
    inclusion probability proportional to weight — and the whole draw
    replays bit-identically across runs and engines (``ln(u)`` rounds
    to 6 dp per the exactness convention; ties break on the key).

    The curation use: sample documents proportionally to a quality or
    domain weight instead of uniformly. ``strata`` makes it top-k per
    group (one rank window) instead of global (TakeOrdered). Zero or
    negative weights are excluded (P(select) = 0)."""
    from pyspark.sql import Window

    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = hash_uniform01(F.col(key_col), salt)
    # u in [0,1): ln(0) would be -inf; the hash draw never returns
    # exactly 0 for real keys (P = 2^-32 per key) but guard anyway
    priority = F.round(F.log(F.greatest(u, F.lit(1e-12))), 6) / w
    cand = df.filter(w > 0).withColumn("__pri", priority)
    if strata:
        win = Window.partitionBy(*strata).orderBy(F.desc("__pri"), F.col(key_col))
        return (
            cand.withColumn("__rn", F.row_number().over(win))
            .filter(F.col("__rn") <= k)
            .drop("__rn", "__pri")
        )
    return cand.orderBy(F.desc("__pri"), F.col(key_col)).limit(k).drop("__pri")
