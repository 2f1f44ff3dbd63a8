"""Independent Python references for the round-7 wave-4/5 operators
with structural (not single-expression) semantics: basket pair
mining, rich-club subgraph filtering, the micro-unit centroid
pipeline, and the bigram entropy rate. Spark == DuckDB is proven by
the parity suite; these prove both == a third implementation.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


def _run(spark, name, sf=SF):
    from real_estate_data_pipeline_spark.queries import CATALOG

    return CATALOG[name].fn(spark, sf).collect()


def _micro_ln(x: float) -> int:
    return int(round(round(math.log(x), 6) * 1000000))


def _r6(x: float) -> float:
    """round(x, 6) with the engines' HALF_UP tie rule on the shortest
    decimal repr (Spark BigDecimal.valueOf / DuckDB round) — Python's
    builtin round is half-even and diverges exactly on 5e-7 ties,
    which centroid means (integer/1e6/n) can actually hit."""
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


def test_basket_lift_matches_python_reference(spark, con):
    """Per-order distinct brand sets, a<b pair counts, min-support 5,
    support/lift, top-20 by raw lift with brand ties."""
    rows = con.execute(
        f"""SELECT DISTINCT l.l_orderkey, p.p_brand
            FROM '{SF}/lineitem.parquet' l
            JOIN '{SF}/part.parquet' p ON p.p_partkey = l.l_partkey"""
    ).fetchall()
    baskets = defaultdict(set)
    for ok, b in rows:
        baskets[ok].add(b)
    n_orders = len(baskets)
    brand_c = Counter()
    pair_c = Counter()
    for bs in baskets.values():
        for b in bs:
            brand_c[b] += 1
        bs = sorted(bs)
        for i in range(len(bs)):
            for j in range(i + 1, len(bs)):
                pair_c[(bs[i], bs[j])] += 1
    out = []
    for (a, b), pc in pair_c.items():
        if pc < 5:
            continue
        lift = pc * n_orders / (brand_c[a] * brand_c[b])
        out.append((a, b, pc, round(pc / n_orders, 6), round(lift, 6)))
    # both engines ORDER BY the rounded lift alias, ties by brand
    out.sort(key=lambda r: (-r[4], r[0], r[1]))
    expect = out[:20]
    got = [
        (r["brand_a"], r["brand_b"], r["pair_orders"], r["support"], r["lift"])
        for r in _run(spark, "basket_brand_pair_lift")
    ]
    assert got == expect


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


def test_rich_club_matches_python_reference(spark):
    """phi(k) over the deg>k subgraph for k in {2,4,8}; groups with
    zero surviving nodes are absent on both sides."""
    pairs = _portable_pairs(spark)
    deg = Counter()
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    expect = []
    for k in (2, 4, 8):
        keep = {n for n, d in deg.items() if d > k}
        if not keep:
            continue
        nk = len(keep)
        ek = sum(1 for a, b in pairs if a in keep and b in keep)
        phi = (
            round(2.0 * ek / (float(nk) * (nk - 1)), 6) if nk > 1 else None
        )
        expect.append((k, nk, ek, phi))
    got = sorted(
        (
            (r["k"], r["n_nodes"], r["n_edges"], r["rich_club_phi"])
            for r in _run(spark, "graph_rich_club")
        )
    )
    assert got == expect


def test_centroid_separation_matches_python_reference(spark, con):
    """Micro-unit centroid means, within-label scatter, pairwise
    centroid distances, nearest-other and separation ratio — the full
    pipeline re-derived with plain loops."""
    rows = con.execute(
        f"SELECT label, embedding FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    by_label = defaultdict(list)
    for lab, emb in rows:
        by_label[lab].append([float(v) for v in emb])
    dim = len(next(iter(by_label.values()))[0])
    cent, nv = {}, {}
    for lab, vecs in by_label.items():
        nv[lab] = len(vecs)
        cent[lab] = [
            _r6(
                sum(math.floor(v[i] * 1000000 + 0.5) for v in vecs)
                / 1000000.0
                / len(vecs)
            )
            for i in range(dim)
        ]
    within = {
        lab: sum(
            math.floor((v[i] - cent[lab][i]) * (v[i] - cent[lab][i]) * 1000000 + 0.5)
            for v in vecs
            for i in range(dim)
        )
        / 1000000.0
        for lab, vecs in by_label.items()
    }
    labs = sorted(by_label)
    nearest = {lab: math.inf for lab in labs}
    for i, la in enumerate(labs):
        for lb in labs[i + 1 :]:
            d2 = (
                sum(
                    math.floor(
                        (cent[la][j] - cent[lb][j]) * (cent[la][j] - cent[lb][j]) * 1000000
                        + 0.5
                    )
                    for j in range(dim)
                )
                / 1000000.0
            )
            nearest[la] = min(nearest[la], d2)
            nearest[lb] = min(nearest[lb], d2)
    expect = []
    for lab in labs:
        wr = math.sqrt(within[lab] / nv[lab])
        nd = math.sqrt(nearest[lab])
        expect.append((lab, nv[lab], round(wr, 6), round(nd, 6), round(nd / wr, 6)))
    got = sorted(
        (
            r["label"],
            r["n_vecs"],
            r["within_rms"],
            r["nearest_centroid_dist"],
            r["separation_ratio"],
        )
        for r in _run(spark, "emb_centroid_separation_report")
    )
    assert got == expect


def test_cusum_matches_direct_recursion(spark, con):
    """The window identity S_t = P_t - min(0, min P_j) vs the direct
    S_t = max(0, S_{t-1} + d_t) recursion, event by event."""
    rows = con.execute(
        f"""SELECT user_id, ts, event_id, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
            FROM '{SF}/events.parquet' ORDER BY user_id, ts, event_id"""
    ).fetchall()
    total = sum(r[3] for r in rows)
    mu = math.floor(total / len(rows))
    by_user = defaultdict(list)
    for u, _, _, c in rows:
        by_user[u].append(c - mu)
    expect = []
    for u, ds in by_user.items():
        s, mx, alarms = 0, 0, 0
        for d in ds:
            s = max(0, s + d)
            mx = max(mx, s)
            if s > 100000:
                alarms += 1
        expect.append((u, len(ds), mx / 100, alarms))
    expect.sort()
    got = sorted(
        (r["user_id"], r["n_events"], r["max_cusum"], r["n_alarms"])
        for r in _run(spark, "evt_cusum_drift_per_user")
    )
    assert got == expect


def test_mmr_matches_python_greedy(spark, con):
    """Greedy MMR re-derived in plain Python: top-16 by rounded
    cosine, then 5 rounds of argmax(0.7*rel - 0.3*max_sim)."""
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    vecs = {vid: [float(v) for v in emb] for vid, emb in rows}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    qv = vecs[0]
    rel = {vid: cos(v, qv) for vid, v in vecs.items() if vid != 0}
    cand = sorted(rel, key=lambda vid: (-rel[vid], vid))[:16]
    # scores are linear combinations of 6-dp inputs, so exact 5e-7
    # ties happen — _r6 (HALF_UP) matches the engines where builtin
    # round (half-even) does not
    picked = [max(cand, key=lambda v: (rel[v], -v))]
    expect = [(1, picked[0], rel[picked[0]], _r6(0.7 * rel[picked[0]]))]
    for r in range(2, 6):
        best, best_key, best_ms = None, None, None
        for c in cand:
            if c in picked:
                continue
            ms = max(cos(vecs[c], vecs[p]) for p in picked)
            score = 0.7 * rel[c] - 0.3 * ms
            key = (-score, c)
            if best_key is None or key < best_key:
                best, best_key, best_ms = c, key, ms
        picked.append(best)
        expect.append((r, best, rel[best], _r6(0.7 * rel[best] - 0.3 * best_ms)))
    got = sorted(
        (r["rank"], r["vec_id"], r["relevance"], r["mmr_score"])
        for r in _run(spark, "sim_mmr_diverse_topk")
    )
    assert got == expect


def test_attribution_matches_python_reference(spark, con):
    """Session, touch-set, last-touch and 1/k linear credits in plain
    Python loops (floored-second session gaps)."""
    from tests.test_round7_wave3_props import _esec

    rows = con.execute(
        f"SELECT user_id, ts, event_id, event_type FROM '{SF}/events.parquet'"
        " ORDER BY user_id, ts, event_id"
    ).fetchall()
    by_user = defaultdict(list)
    for u, ts, eid, et in rows:
        by_user[u].append((_esec(ts), ts, eid, et))
    last_touch = Counter()
    credit_u = Counter()
    for u, evs in by_user.items():
        sessions, cur, prev = [], [], None
        for sec, ts, eid, et in evs:
            if prev is not None and sec - prev > 1800:
                sessions.append(cur)
                cur = []
            cur.append((ts, eid, et))
            prev = sec
        sessions.append(cur)
        for s in sessions:
            for i, (ts, eid, et) in enumerate(s):
                if et != "purchase":
                    continue
                touches, last = set(), None
                for pts, pid, pet in s[:i]:
                    if pet != "purchase":
                        touches.add(pet)
                        last = pet  # event-level latest in (ts, id) order
                if not touches:
                    continue
                k = len(touches)
                last_touch[last] += 1
                for tt in touches:
                    credit_u[tt] += math.floor(1000000.0 / k + 0.5)
    expect = sorted(
        (tt, last_touch.get(tt, 0), round(credit_u[tt] / 1000000, 6))
        for tt in credit_u
    )
    got = sorted(
        (r["touch_type"], r["last_touch_conversions"], r["linear_credit"])
        for r in _run(spark, "evt_conversion_attribution")
    )
    assert got == expect


def test_bigram_entropy_rate_matches_python_reference(spark, con):
    """Per-lang conditional entropy from adjacent-token bigram type
    counts with micro-nat c*ln(c12/c1) products."""
    rows = con.execute(
        f"SELECT lang, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    c2 = Counter()
    for lang, text in rows:
        toks = re.split(r"\s+", text.strip().lower())
        for w1, w2 in zip(toks, toks[1:]):
            if w1 and w2:
                c2[(lang, w1, w2)] += 1
    c1 = Counter()
    for (lang, w1, _), c in c2.items():
        c1[(lang, w1)] += c
    agg = defaultdict(lambda: [0, 0, 0])  # lang -> [n_inst, n_types, s6]
    for (lang, w1, _), c in c2.items():
        a = agg[lang]
        a[0] += c
        a[1] += 1
        a[2] += c * _micro_ln(c / c1[(lang, w1)])
    expect = sorted(
        (lang, a[0], a[1], round(-(a[2] / 1000000) / float(a[0]), 6))
        for lang, a in agg.items()
    )
    got = sorted(
        (
            r["lang"],
            r["n_bigrams"],
            r["n_bigram_types"],
            r["entropy_rate_nats"],
        )
        for r in _run(spark, "doc_bigram_entropy_rate_by_lang")
    )
    assert got == expect
