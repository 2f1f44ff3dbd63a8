"""Independent Python references for the round-7 third-wave operators
whose semantics are structural (life tables, peeling, rank formulas,
banded medians, importance weighting) rather than single-expression
arithmetic. The parity suite proves Spark == DuckDB; these prove both
== a hand-rolled third implementation, guarding the same-bug-in-both
failure mode the cross-engine hash cannot catch.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from datetime import datetime

import duckdb
import pytest

SF = "/root/testdata/sf0.001"

_EPOCH = datetime(1970, 1, 1)


def _esec(ts: datetime) -> int:
    """FLOOR(epoch(ts)) for tz-naive timestamps — both engines treat
    the naive value as UTC; Python must NOT go through .timestamp()
    (local-tz dependent)."""
    return math.floor((ts - _EPOCH).total_seconds())


def _run(spark, name, sf=SF):
    from real_estate_data_pipeline_spark.queries import CATALOG

    return CATALOG[name].fn(spark, sf).collect()


def _micro_ln(x: float) -> int:
    """The engine-wide micro-nat convention: round(round(ln x, 6)*1e6)."""
    return int(round(round(math.log(x), 6) * 1000000))


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


def test_survival_km_matches_python_reference(spark, con):
    """Life-table Kaplan-Meier from raw events in plain Python:
    weekly lifetimes, right-censoring at horizon-7d, S(w) as the
    micro-nat product with the extinction-pins-zero rule."""
    rows = con.execute(
        f"SELECT user_id, MIN(ts), MAX(ts) FROM '{SF}/events.parquet' GROUP BY user_id"
    ).fetchall()
    hmax = max(r[2] for r in rows)
    lt = []
    for _, fts, lts in rows:
        wk = math.floor((_esec(lts) - _esec(fts)) / 604800.0)
        censored = (_esec(hmax) - _esec(lts)) < 604800
        lt.append((wk, censored))
    expect = []
    cum6, ext = 0, False
    for w in range(1, 5):
        at_risk = sum(1 for wk, _ in lt if wk >= w - 1)
        deaths = sum(1 for wk, c in lt if wk == w - 1 and not c)
        if deaths >= at_risk:
            ext = True
        else:
            cum6 += _micro_ln(1.0 - deaths / at_risk)
        surv = 0.0 if ext else round(math.exp(cum6 / 1000000), 6)
        expect.append((w, at_risk, deaths, surv))
    got = [
        (r["week"], r["at_risk"], r["deaths"], r["survival"])
        for r in sorted(_run(spark, "evt_survival_km_weekly"), key=lambda r: r["week"])
    ]
    assert got == expect


def test_revenue_gini_matches_python_reference(spark, con):
    """Gini from first principles: exact cents, (cents, custkey) sort,
    G = 2*sum(i*x_i)/(n*sum x) - (n+1)/n."""
    rows = con.execute(
        f"SELECT o_custkey, o_totalprice FROM '{SF}/orders.parquet'"
    ).fetchall()
    rev = Counter()
    for ck, p in rows:
        rev[ck] += int(round(p * 100))
    xs = [c for _, c in sorted(rev.items(), key=lambda kv: (kv[1], kv[0]))]
    n, tot = len(xs), sum(xs)
    wsum = sum((i + 1) * x for i, x in enumerate(xs))
    gini = round(2.0 * wsum / (float(n) * tot) - (n + 1.0) / n, 6)
    [r] = _run(spark, "cust_revenue_gini")
    assert (r["n_customers"], r["total_revenue"], r["gini"]) == (n, tot / 100, gini)


def _portable_pairs(spark):
    from real_estate_data_pipeline_spark.ops import dedup
    from real_estate_data_pipeline_spark.queries import t

    d = t(spark, SF, "documents")
    return [
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_dup_pairs_portable(
            d, "doc_id", "text", num_perm=16, bands=4, jaccard_threshold=0.5
        )
        .select("id_a", "id_b")
        .collect()
    ]


def test_kcore_peel_matches_python_reference(spark):
    """3 rounds of k=2 peeling in plain Python over the same portable
    pair set: drop degree<2 nodes, keep edges between survivors."""
    edges = set(_portable_pairs(spark))
    expect = []
    for r in range(1, 4):
        deg = Counter()
        for a, b in edges:
            deg[a] += 1
            deg[b] += 1
        keep = {n for n, d in deg.items() if d >= 2}
        edges = {(a, b) for a, b in edges if a in keep and b in keep}
        expect.append((r, len(keep), len(edges)))
    got = [
        (r["peel_round"], r["nodes_ge_k"], r["edges_kept"])
        for r in sorted(
            _run(spark, "graph_kcore_peel_rounds"), key=lambda r: r["peel_round"]
        )
    ]
    assert got == expect


def test_theil_sen_matches_python_reference(spark, con):
    """Banded Theil-Sen: daily counts, slopes over gaps 1..14, exact
    median (mean of middle two for even counts)."""
    rows = con.execute(
        f"""SELECT CAST(FLOOR(epoch(ts)/86400.0) AS BIGINT) dn, COUNT(*) y
            FROM '{SF}/events.parquet' GROUP BY dn"""
    ).fetchall()
    days = dict(rows)
    slopes = []
    for dn, y1 in days.items():
        for k in range(1, 15):
            if dn + k in days:
                slopes.append((days[dn + k] - y1) / float(k))
    slopes.sort()
    m = len(slopes)
    med = (
        slopes[m // 2]
        if m % 2
        else (slopes[m // 2 - 1] + slopes[m // 2]) / 2
    )
    [r] = _run(spark, "evt_theil_sen_daily_trend")
    assert (r["n_pairs"], r["theil_sen_slope"]) == (m, round(med, 6))


def test_dsir_weights_match_python_reference(spark, con):
    """DSIR from scratch: whitespace unigrams, Laplace-smoothed target
    (lang='en') vs raw corpus distributions, per-token micro-nat log
    ratios, per-doc integer dot products, top-20 with doc-id ties."""
    rows = con.execute(
        f"SELECT doc_id, lang, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    doc_tok = {}
    raw, tgt = Counter(), Counter()
    for doc_id, lang, text in rows:
        toks = [w for w in re.split(r"\s+", text.strip().lower()) if w]
        doc_tok[doc_id] = (lang, Counter(toks))
        raw.update(toks)
        if lang == "en":
            tgt.update(toks)
    tr, tt, v = sum(raw.values()), sum(tgt.values()), len(raw)
    lr6 = {
        w: _micro_ln((tgt.get(w, 0) + 1.0) / (tt + v))
        - _micro_ln((raw[w] + 1.0) / (tr + v))
        for w in raw
    }
    scored = []
    for doc_id, (lang, cnt) in doc_tok.items():
        if not cnt:
            continue
        w6 = sum(c * lr6[w] for w, c in cnt.items())
        scored.append((doc_id, lang, sum(cnt.values()), round(w6 / 1000000, 6)))
    scored.sort(key=lambda r: (-r[3], r[0]))
    expect = scored[:20]
    got = [
        (r["doc_id"], r["lang"], r["n_tokens"], r["dsir_weight"])
        for r in _run(spark, "doc_dsir_importance_weights")
    ]
    assert got == expect


def test_session_path_trigrams_match_python_reference(spark, con):
    """Sessionize (30-min gap, ts+event_id order) and count 3-step
    event-type paths in plain Python."""
    rows = con.execute(
        f"SELECT user_id, ts, event_id, event_type FROM '{SF}/events.parquet'"
        " ORDER BY user_id, ts, event_id"
    ).fetchall()
    by_user = defaultdict(list)
    for u, ts, eid, et in rows:
        by_user[u].append((ts, eid, et))
    paths = Counter()
    for u, evs in by_user.items():
        sessions, cur, prev_ts = [], [], None
        for ts, eid, et in evs:
            # floored-seconds gap — the engine-wide sessionization compare
            if prev_ts is not None and _esec(ts) - _esec(prev_ts) > 1800:
                sessions.append(cur)
                cur = []
            cur.append(et)
            prev_ts = ts
        sessions.append(cur)
        for s in sessions:
            for i in range(len(s) - 2):
                paths[f"{s[i]}>{s[i + 1]}>{s[i + 2]}"] += 1
    expect = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r["path"], r["n_paths"]) for r in _run(spark, "evt_session_path_trigrams")
    ]
    assert got == expect
