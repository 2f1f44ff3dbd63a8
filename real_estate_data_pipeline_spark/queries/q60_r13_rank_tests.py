"""Round-13 wave 4: rank-based two-sample and association statistics
computed exactly from value-domain histograms — the partial Kendall
tau-b (quantity ~ discount controlling tax), Stuart's tau-c, the
Brunner-Munzel heteroskedastic rank test, the tie-adjusted
Ansari-Bradley dispersion test, and the Cucconi joint location-scale
test.

Everything reduces to bounded histograms first (50 quantity values, 11
discounts, 9 taxes); midranks are kept exact by doubling, variance
terms by clearing denominators (multiply through by n before squaring),
and every cross-cell sum is an exact BIGINT/HUGEINT — the closing
assembly is the only IEEE arithmetic, written in the same order for
both engines.
"""

from __future__ import annotations

from ._registry import CATALOG, F, Window, register, t


def _taub_ctes(xexpr: str, yexpr: str, p: str) -> str:
    """CTE block computing Kendall tau-b ingredients for the integer
    value pair (xexpr, yexpr) over lineitem: {p}res(cd, dx, dy) with
    cd = concordant-minus-discordant and dx/dy = T0 - (x/y tie mass),
    all exact BIGINTs.  The grid self-join is bounded by the value
    domains (<= 550 cells a side)."""
    return f"""{p}h AS (
      SELECT {xexpr} AS x, {yexpr} AS y, CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2
    ),
    {p}tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM {p}h),
    {p}cd AS (
      SELECT CAST(SUM(CAST(a.c AS HUGEINT) * b.c
                       * CASE WHEN b.y > a.y THEN 1
                              WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS cd
      FROM {p}h a JOIN {p}h b ON a.x < b.x
    ),
    {p}tx AS (
      SELECT CAST(COALESCE(SUM(CAST(tc AS HUGEINT) * (tc - 1) / 2), 0) AS BIGINT)
               AS tiex
      FROM (SELECT CAST(SUM(c) AS BIGINT) AS tc FROM {p}h GROUP BY x)
    ),
    {p}ty AS (
      SELECT CAST(COALESCE(SUM(CAST(tc AS HUGEINT) * (tc - 1) / 2), 0) AS BIGINT)
               AS tiey
      FROM (SELECT CAST(SUM(c) AS BIGINT) AS tc FROM {p}h GROUP BY y)
    ),
    {p}res AS (
      SELECT {p}cd.cd,
             CAST(t.n AS HUGEINT) * (t.n - 1) / 2 - {p}tx.tiex AS dx,
             CAST(t.n AS HUGEINT) * (t.n - 1) / 2 - {p}ty.tiey AS dy
      FROM {p}cd CROSS JOIN {p}tot t CROSS JOIN {p}tx CROSS JOIN {p}ty
    )"""


def _taub_frame(spark, sf_dir, xcol, ycol):
    """Spark twin of _taub_ctes: the 1-row (cd, dx, dy) tau-b
    ingredient frame for two integer-valued lineitem columns."""
    li = t(spark, sf_dir, "lineitem")
    h = (
        li.groupBy(xcol.alias("x"), ycol.alias("y"))
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=False)  # feeds the grid join and both margins
    )
    tot = h.agg(F.sum("c").cast("long").alias("n"))
    a = h.select(F.col("x").alias("ax"), F.col("y").alias("ay"), F.col("c").alias("ac"))
    b = h.select(F.col("x").alias("bx"), F.col("y").alias("by"), F.col("c").alias("bc"))
    cd = a.join(F.broadcast(b), F.col("ax") < F.col("bx")).agg(
        F.sum(
            F.col("ac").cast("decimal(38,0)")
            * F.col("bc")
            * F.when(F.col("by") > F.col("ay"), 1)
            .when(F.col("by") < F.col("ay"), -1)
            .otherwise(0)
        )
        .cast("long")
        .alias("cd")
    )
    tx = (
        h.groupBy("x")
        .agg(F.sum("c").cast("long").alias("tc"))
        .agg(
            F.coalesce(
                F.sum(F.col("tc").cast("decimal(38,0)") * (F.col("tc") - 1) / 2),
                F.lit(0),
            )
            .cast("long")
            .alias("tiex")
        )
    )
    ty = (
        h.groupBy("y")
        .agg(F.sum("c").cast("long").alias("tc"))
        .agg(
            F.coalesce(
                F.sum(F.col("tc").cast("decimal(38,0)") * (F.col("tc") - 1) / 2),
                F.lit(0),
            )
            .cast("long")
            .alias("tiey")
        )
    )
    t0 = F.col("n").cast("decimal(38,0)") * (F.col("n") - 1) / 2
    return (
        cd.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .select(
            "cd",
            (t0 - F.col("tiex")).alias("dx"),
            (t0 - F.col("tiey")).alias("dy"),
        )
    )


_QTY = "CAST(l_quantity AS BIGINT)"
_DISC = "CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)"
_TAX = "CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT)"


register(
    "ml_partial_tau_b_qdt",
    # Partial Kendall tau-b of quantity ~ discount controlling for tax:
    # tau_xy.z = (tau_xy - tau_xz*tau_yz)
    #            / sqrt((1 - tau_xz^2)(1 - tau_yz^2)).
    # Each of the three tau-b's comes from its bounded value-domain
    # grid (<= 550 cells a side) with exact concordance counts and tie
    # masses; the partial assembles from three 1-row frames.
    oracle=f"""
    WITH {_taub_ctes(_QTY, _DISC, "xy")},
    {_taub_ctes(_QTY, _TAX, "xz")},
    {_taub_ctes(_DISC, _TAX, "yz")},
    taus AS (
      SELECT
        CAST(xy.cd AS DOUBLE) / sqrt(CAST(xy.dx AS DOUBLE) * CAST(xy.dy AS DOUBLE))
          AS txy,
        CAST(xz.cd AS DOUBLE) / sqrt(CAST(xz.dx AS DOUBLE) * CAST(xz.dy AS DOUBLE))
          AS txz,
        CAST(yz.cd AS DOUBLE) / sqrt(CAST(yz.dx AS DOUBLE) * CAST(yz.dy AS DOUBLE))
          AS tyz
      FROM xyres xy CROSS JOIN xzres xz CROSS JOIN yzres yz
    )
    SELECT round(txy, 6) AS tau_xy, round(txz, 6) AS tau_xz,
           round(tyz, 6) AS tau_yz,
           round((txy - txz * tyz)
                 / sqrt((1.0 - txz * txz) * (1.0 - tyz * tyz)), 6)
             AS partial_tau_xy_z
    FROM taus
    """,
)


def _dpartialtaub(spark, sf_dir):
    """Partial tau-b: three bounded-grid tau ingredient frames (one
    per variable pair), a 1x1x1 closing join — ordinal partial
    association with zero fact-side pair joins."""
    qty = F.col("l_quantity").cast("long")
    disc = (F.col("l_discount").cast("decimal(18,2)") * 100).cast("long")
    tax = (F.col("l_tax").cast("decimal(18,2)") * 100).cast("long")
    xy = _taub_frame(spark, sf_dir, qty, disc)
    xz = _taub_frame(spark, sf_dir, qty, tax)
    yz = _taub_frame(spark, sf_dir, disc, tax)

    def tau(df, name):
        return df.select(
            (
                F.col("cd").cast("double")
                / F.sqrt(F.col("dx").cast("double") * F.col("dy").cast("double"))
            ).alias(name)
        )

    taus = (
        tau(xy, "txy")
        .crossJoin(F.broadcast(tau(xz, "txz")))
        .crossJoin(F.broadcast(tau(yz, "tyz")))
    )
    return taus.select(
        F.round("txy", 6).alias("tau_xy"),
        F.round("txz", 6).alias("tau_xz"),
        F.round("tyz", 6).alias("tau_yz"),
        F.round(
            (F.col("txy") - F.col("txz") * F.col("tyz"))
            / F.sqrt(
                (F.lit(1.0) - F.col("txz") * F.col("txz"))
                * (F.lit(1.0) - F.col("tyz") * F.col("tyz"))
            ),
            6,
        ).alias("partial_tau_xy_z"),
    )


CATALOG["ml_partial_tau_b_qdt"].fn = _dpartialtaub


register(
    "ml_stuart_tau_c_qty_discount",
    # Stuart's tau-c — the rectangular-table correction of tau-b —
    # between quantity and discount: tau_c = (C - D) * 2m / (n^2(m-1))
    # with m = min(#rows, #cols) taken from the observed value domains.
    # Rides the same exact concordance machinery as the partial tau.
    oracle=f"""
    WITH {_taub_ctes(_QTY, _DISC, "tc")},
    dims AS (
      SELECT CAST(COUNT(DISTINCT {_QTY}) AS BIGINT) AS nr,
             CAST(COUNT(DISTINCT {_DISC}) AS BIGINT) AS nc,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem
    )
    SELECT dims.n AS n_rows, CAST(tcres.cd AS BIGINT) AS conc_minus_disc,
           round(CAST(tcres.cd AS DOUBLE) * 2.0 * LEAST(dims.nr, dims.nc)
                 / (CAST(dims.n AS DOUBLE) * dims.n * (LEAST(dims.nr, dims.nc) - 1)),
                 6) AS tau_c
    FROM tcres CROSS JOIN dims
    """,
)


def _dstuarttauc(spark, sf_dir):
    """Stuart's tau-c: the shared tau ingredient frame plus one
    distinct-count row — the table-shape-corrected ordinal
    association."""
    qty = F.col("l_quantity").cast("long")
    disc = (F.col("l_discount").cast("decimal(18,2)") * 100).cast("long")
    ing = _taub_frame(spark, sf_dir, qty, disc)
    li = t(spark, sf_dir, "lineitem")
    dims = li.agg(
        F.countDistinct(qty).cast("long").alias("nr"),
        F.countDistinct(disc).cast("long").alias("nc"),
        F.count("*").cast("long").alias("n"),
    )
    m = F.least(F.col("nr"), F.col("nc"))
    return ing.crossJoin(F.broadcast(dims)).select(
        F.col("n").alias("n_rows"),
        F.col("cd").cast("long").alias("conc_minus_disc"),
        F.round(
            F.col("cd").cast("double") * 2.0 * m
            / (F.col("n").cast("double") * F.col("n") * (m - 1)),
            6,
        ).alias("tau_c"),
    )


CATALOG["ml_stuart_tau_c_qty_discount"].fn = _dstuarttauc


# The two-class quantity histogram with exact doubled midranks
# (combined and within-class), single-sourced for the Brunner-Munzel,
# Ansari-Bradley and Cucconi tests: rc2 = doubled combined midrank,
# rx2/ry2 = doubled within-class midranks, cx/cy the class counts.
_RANK2_CTES = """vc AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cx,
             CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS cy
      FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1
    ),
    rw AS (
      SELECT q, cx, cy, cx + cy AS c,
             2 * (SUM(cx + cy) OVER (ORDER BY q) - (cx + cy)) + (cx + cy) + 1 AS rc2,
             2 * (SUM(cx) OVER (ORDER BY q) - cx) + cx + 1 AS rx2,
             2 * (SUM(cy) OVER (ORDER BY q) - cy) + cy + 1 AS ry2,
             SUM(cx) OVER () AS nx, SUM(cy) OVER () AS ny
      FROM vc
    )"""


def _rank2_frame(spark, sf_dir):
    """Spark twin of _RANK2_CTES: the per-value doubled-midrank frame
    (q, cx, cy, c, rc2, rx2, ry2, nx, ny) over the R/N quantity
    histogram."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag").isin("R", "N"))
    vc = li.groupBy(F.col("l_quantity").cast("long").alias("q")).agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("cx"),
        F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0))
        .cast("long")
        .alias("cy"),
    )
    wcum = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.orderBy("q").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = F.col("cx") + F.col("cy")
    return vc.select(
        "q",
        "cx",
        "cy",
        c.alias("c"),
        (2 * (F.sum(c).over(wcum) - c) + c + 1).alias("rc2"),
        (2 * (F.sum("cx").over(wcum) - F.col("cx")) + F.col("cx") + 1).alias("rx2"),
        (2 * (F.sum("cy").over(wcum) - F.col("cy")) + F.col("cy") + 1).alias("ry2"),
        F.sum("cx").over(wall).alias("nx"),
        F.sum("cy").over(wall).alias("ny"),
    )


register(
    "ml_brunner_munzel_quantity",
    # Brunner-Munzel heteroskedastic rank test (R vs N quantities):
    # p_hat = P(X < Y) + P(X = Y)/2 and the studentized W with the
    # rank-variance estimates S_x, S_y.  All midranks are exact doubled
    # integers; the variance terms clear denominators by multiplying
    # through by n before squaring (T = n*(rc2 - rw2) - SR2 + n*(n+1)),
    # so every cross-value sum is an exact HUGEINT and the closing
    # studentization is the only IEEE arithmetic.
    oracle=f"""
    WITH {_RANK2_CTES},
    sums AS (
      SELECT MAX(nx) AS nx, MAX(ny) AS ny,
             CAST(SUM(cx * rc2) AS BIGINT) AS srx2,
             CAST(SUM(cy * rc2) AS BIGINT) AS sry2
      FROM rw
    ),
    var AS (
      SELECT
        CAST(SUM(CAST(cx AS HUGEINT)
                 * (s.nx * (rw.rc2 - rw.rx2) - s.srx2 + s.nx * (s.nx + 1))
                 * (s.nx * (rw.rc2 - rw.rx2) - s.srx2 + s.nx * (s.nx + 1)))
             AS DOUBLE) AS qx,
        CAST(SUM(CAST(cy AS HUGEINT)
                 * (s.ny * (rw.rc2 - rw.ry2) - s.sry2 + s.ny * (s.ny + 1))
                 * (s.ny * (rw.rc2 - rw.ry2) - s.sry2 + s.ny * (s.ny + 1)))
             AS DOUBLE) AS qy
      FROM rw CROSS JOIN sums s
    )
    SELECT CAST(s.nx AS BIGINT) AS n_r, CAST(s.ny AS BIGINT) AS n_n,
           round((CAST(s.sry2 AS DOUBLE) / (2.0 * s.ny) - (s.ny + 1) / 2.0) / s.nx,
                 6) AS p_hat,
           round(CAST(s.nx AS DOUBLE) * s.ny
                 * (CAST(s.sry2 AS DOUBLE) / (2.0 * s.ny)
                    - CAST(s.srx2 AS DOUBLE) / (2.0 * s.nx))
                 / ((s.nx + CAST(s.ny AS DOUBLE))
                    * sqrt(s.nx * (v.qx / (4.0 * s.nx * s.nx * (s.nx - 1)))
                           + s.ny * (v.qy / (4.0 * s.ny * s.ny * (s.ny - 1))))),
                 6) AS w_stat
    FROM sums s CROSS JOIN var v
    """,
)


def _dbrunnermunzel(spark, sf_dir):
    """Brunner-Munzel from the shared doubled-midrank frame: one rank
    frame, one exact moment row, one exact variance row, a 1x1 closing
    join."""
    rw = _rank2_frame(spark, sf_dir).localCheckpoint(eager=False)
    sums = rw.agg(
        F.max("nx").alias("nx"),
        F.max("ny").alias("ny"),
        F.sum(F.col("cx") * F.col("rc2")).cast("long").alias("srx2"),
        F.sum(F.col("cy") * F.col("rc2")).cast("long").alias("sry2"),
    )
    # rw carries its own nx/ny (window totals) — project them away so the
    # crossJoin with the moment row keeps a single unambiguous pair
    j = rw.select("cx", "cy", "rc2", "rx2", "ry2").crossJoin(F.broadcast(sums))
    tx = (
        F.col("nx") * (F.col("rc2") - F.col("rx2"))
        - F.col("srx2")
        + F.col("nx") * (F.col("nx") + 1)
    )
    ty = (
        F.col("ny") * (F.col("rc2") - F.col("ry2"))
        - F.col("sry2")
        + F.col("ny") * (F.col("ny") + 1)
    )
    var = j.agg(
        F.sum(F.col("cx").cast("decimal(38,0)") * tx.cast("decimal(19,0)") * tx)
        .cast("double")
        .alias("qx"),
        F.sum(F.col("cy").cast("decimal(38,0)") * ty.cast("decimal(19,0)") * ty)
        .cast("double")
        .alias("qy"),
    )
    s = sums
    nxd = F.col("nx").cast("double")
    nyd = F.col("ny").cast("double")
    rybar = F.col("sry2").cast("double") / (2.0 * F.col("ny"))
    rxbar = F.col("srx2").cast("double") / (2.0 * F.col("nx"))
    sx = F.col("qx") / (4.0 * F.col("nx") * F.col("nx") * (F.col("nx") - 1))
    sy = F.col("qy") / (4.0 * F.col("ny") * F.col("ny") * (F.col("ny") - 1))
    return s.crossJoin(F.broadcast(var)).select(
        F.col("nx").cast("long").alias("n_r"),
        F.col("ny").cast("long").alias("n_n"),
        F.round((rybar - (F.col("ny") + 1) / 2.0) / F.col("nx"), 6).alias("p_hat"),
        F.round(
            nxd
            * F.col("ny")
            * (rybar - rxbar)
            / (
                (F.col("nx") + nyd)
                * F.sqrt(F.col("nx") * sx + F.col("ny") * sy)
            ),
            6,
        ).alias("w_stat"),
    )


CATALOG["ml_brunner_munzel_quantity"].fn = _dbrunnermunzel


register(
    "ml_ansari_bradley_dispersion",
    # Tie-adjusted Ansari-Bradley scale test (R vs N quantities):
    # scores s = min(rank, N+1-rank) on doubled midranks, AB = sum of
    # R-sample scores; E[AB] = nx*sum(S)/N and Var[AB] = nx*ny*
    # (N*sum(S^2) - sum(S)^2) / (N^2 (N-1)) use the tie-adjusted score
    # moments, all exact HUGEINT sums in doubled units.
    oracle=f"""
    WITH {_RANK2_CTES},
    sc AS (
      SELECT cx, cy, c, nx, ny, nx + ny AS nn,
             LEAST(rc2, 2 * (nx + ny + 1) - rc2) AS s2
      FROM rw
    ),
    agg AS (
      SELECT MAX(nx) AS nx, MAX(ny) AS ny, MAX(nn) AS nn,
             CAST(SUM(cx * s2) AS BIGINT) AS ab2,
             CAST(SUM(c * s2) AS BIGINT) AS ss2,
             SUM(CAST(c AS HUGEINT) * s2 * s2) AS ss2sq
      FROM sc
    )
    SELECT CAST(nx AS BIGINT) AS n_r, CAST(ny AS BIGINT) AS n_n,
           round(CAST(ab2 AS DOUBLE) / 2.0, 6) AS ab_stat,
           round((CAST(ab2 AS DOUBLE) / 2.0 - CAST(nx AS DOUBLE) * ss2 / (2.0 * nn))
                 / sqrt(CAST(nx AS DOUBLE) * ny
                        * (CAST(nn AS DOUBLE) * CAST(ss2sq AS DOUBLE)
                           - CAST(ss2 AS DOUBLE) * ss2)
                        / (4.0 * CAST(nn AS DOUBLE) * nn * (nn - 1))), 6) AS z_stat
    FROM agg
    """,
)


def _dansaribradley(spark, sf_dir):
    """Ansari-Bradley: the shared doubled-midrank frame, a per-value
    folded score, one exact moment row — the scale test at GROUP-BY
    cost."""
    rw = _rank2_frame(spark, sf_dir)
    nn = F.col("nx") + F.col("ny")
    sc = rw.select(
        "cx",
        "cy",
        "c",
        "nx",
        "ny",
        nn.alias("nn"),
        F.least(F.col("rc2"), 2 * (nn + 1) - F.col("rc2")).alias("s2"),
    )
    agg = sc.agg(
        F.max("nx").alias("nx"),
        F.max("ny").alias("ny"),
        F.max("nn").alias("nn"),
        F.sum(F.col("cx") * F.col("s2")).cast("long").alias("ab2"),
        F.sum(F.col("c") * F.col("s2")).cast("long").alias("ss2"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("s2") * F.col("s2")).alias(
            "ss2sq"
        ),
    )
    nxd = F.col("nx").cast("double")
    nnd = F.col("nn").cast("double")
    ab = F.col("ab2").cast("double") / 2.0
    e_ab = nxd * F.col("ss2") / (2.0 * F.col("nn"))
    var_ab = (
        nxd
        * F.col("ny")
        * (nnd * F.col("ss2sq").cast("double") - F.col("ss2").cast("double") * F.col("ss2"))
        / (4.0 * nnd * F.col("nn") * (F.col("nn") - 1))
    )
    return agg.select(
        F.col("nx").cast("long").alias("n_r"),
        F.col("ny").cast("long").alias("n_n"),
        F.round(ab, 6).alias("ab_stat"),
        F.round((ab - e_ab) / F.sqrt(var_ab), 6).alias("z_stat"),
    )


CATALOG["ml_ansari_bradley_dispersion"].fn = _dansaribradley


register(
    "ml_cucconi_location_scale",
    # Cucconi joint location-scale test (R vs N quantities): U from the
    # squared combined ranks of the N sample, V from the squared
    # contrary ranks, C = (U^2 + V^2 - 2*rho*U*V) / (2(1 - rho^2)) with
    # rho = 2(N^2-4)/((2N+1)(8N+11)) - 1.  Rank squares stay exact by
    # working in doubled units (numerators x4); the three closing
    # expressions are the only IEEE arithmetic.
    oracle=f"""
    WITH {_RANK2_CTES},
    agg AS (
      SELECT MAX(nx) AS nx, MAX(ny) AS ny, MAX(nx + ny) AS nn,
             SUM(CAST(cy AS HUGEINT) * rc2 * rc2) AS sr4,
             SUM(CAST(cy AS HUGEINT) * (2 * (nx + ny + 1) - rc2)
                 * (2 * (nx + ny + 1) - rc2)) AS sc4
      FROM rw
    ),
    uv AS (
      SELECT nx, ny, nn,
             CAST(6 * sr4 - 4 * CAST(ny AS HUGEINT) * (nn + 1) * (2 * nn + 1)
                  AS DOUBLE)
               / (4.0 * sqrt(CAST(nx AS DOUBLE) * ny * (nn + 1) * (2.0 * nn + 1)
                             * (8.0 * nn + 11) / 5.0)) AS u,
             CAST(6 * sc4 - 4 * CAST(ny AS HUGEINT) * (nn + 1) * (2 * nn + 1)
                  AS DOUBLE)
               / (4.0 * sqrt(CAST(nx AS DOUBLE) * ny * (nn + 1) * (2.0 * nn + 1)
                             * (8.0 * nn + 11) / 5.0)) AS v,
             2.0 * (CAST(nn AS DOUBLE) * nn - 4)
               / ((2.0 * nn + 1) * (8.0 * nn + 11)) - 1.0 AS rho
      FROM agg
    )
    SELECT CAST(nx AS BIGINT) AS n_r, CAST(ny AS BIGINT) AS n_n,
           round(u, 6) AS u_stat, round(v, 6) AS v_stat,
           round((u * u + v * v - 2.0 * rho * u * v)
                 / (2.0 * (1.0 - rho * rho)), 6) AS c_stat
    FROM uv
    """,
)


def _dcucconi(spark, sf_dir):
    """Cucconi: the shared doubled-midrank frame, one exact
    rank-square moment row, three closing expressions."""
    rw = _rank2_frame(spark, sf_dir)
    nn = F.col("nx") + F.col("ny")
    contra = 2 * (nn + 1) - F.col("rc2")
    agg = rw.agg(
        F.max("nx").alias("nx"),
        F.max("ny").alias("ny"),
        F.max(nn).alias("nn"),
        F.sum(F.col("cy").cast("decimal(38,0)") * F.col("rc2") * F.col("rc2")).alias(
            "sr4"
        ),
        F.sum(F.col("cy").cast("decimal(38,0)") * contra * contra).alias("sc4"),
    )
    nxd = F.col("nx").cast("double")
    nnd = F.col("nn").cast("double")
    den = 4.0 * F.sqrt(
        nxd * F.col("ny") * (F.col("nn") + 1) * (2.0 * F.col("nn") + 1)
        * (8.0 * F.col("nn") + 11) / 5.0
    )
    base4 = (
        F.lit(4) * F.col("ny").cast("decimal(38,0)") * (F.col("nn") + 1)
        * (2 * F.col("nn") + 1)
    )
    u = (F.lit(6) * F.col("sr4") - base4).cast("double") / den
    v = (F.lit(6) * F.col("sc4") - base4).cast("double") / den
    rho = 2.0 * (nnd * F.col("nn") - 4) / ((2.0 * F.col("nn") + 1) * (8.0 * F.col("nn") + 11)) - 1.0
    uv = agg.select(
        "nx", "ny", u.alias("u"), v.alias("v"), rho.alias("rho")
    )
    return uv.select(
        F.col("nx").cast("long").alias("n_r"),
        F.col("ny").cast("long").alias("n_n"),
        F.round("u", 6).alias("u_stat"),
        F.round("v", 6).alias("v_stat"),
        F.round(
            (F.col("u") * F.col("u") + F.col("v") * F.col("v")
             - 2.0 * F.col("rho") * F.col("u") * F.col("v"))
            / (2.0 * (1.0 - F.col("rho") * F.col("rho"))),
            6,
        ).alias("c_stat"),
    )


CATALOG["ml_cucconi_location_scale"].fn = _dcucconi
