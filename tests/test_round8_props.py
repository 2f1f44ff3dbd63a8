"""Independent Python references for the round-8 operators. Spark ==
DuckDB is proven by the parity suite; these prove both == a third
implementation built from first principles, guarding against
same-bug-in-both-engines failures (shared formula typos, shared
rounding mistakes, shared off-by-one in unrolled iterations).
"""

from __future__ import annotations

import hashlib
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


def _hash01(key: str) -> float:
    """The engine-wide sha2 uniform draw: first 8 hex chars / 2^32."""
    return int(hashlib.sha256(key.encode()).hexdigest()[:8], 16) / 4294967296.0


def _r6(x: float) -> float:
    """round(x, 6) with the engines' HALF_UP tie rule (see wave5 props)."""
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def _r2(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP))


def _micro(x: float) -> int:
    """floor(x * 1e6 + 0.5) — the micro-unit integer snap."""
    return math.floor(x * 1e6 + 0.5)


def _micro_ln(x: float) -> int:
    """CAST(round(round(ln(x), 6) * 1e6) AS BIGINT)."""
    return int(round(_r6(math.log(x)) * 1e6))


def _quantile_cont(sorted_vals, q: float) -> float:
    """quantile_cont / F.percentile linear interpolation."""
    pos = (len(sorted_vals) - 1) * q
    lo = math.floor(pos)
    if lo + 1 >= len(sorted_vals):
        return float(sorted_vals[-1])
    frac = pos - lo
    return sorted_vals[lo] + frac * (sorted_vals[lo + 1] - sorted_vals[lo])


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


def _order_cents(con):
    return con.execute(
        f"""SELECT o_orderkey, o_custkey,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            FROM '{SF}/orders.parquet'"""
    ).fetchall()


def test_permutation_test_matches_python_reference(spark, con):
    rows = con.execute(
        f"""SELECT o.o_orderkey, c.c_mktsegment,
                   CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            FROM '{SF}/orders.parquet' o
            JOIN '{SF}/customer.parquet' c ON c.c_custkey = o.o_custkey
            WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')"""
    ).fetchall()
    n_a = sum(1 for _, s, _ in rows if s == "BUILDING")
    n_b = len(rows) - n_a
    s_a = sum(c for _, s, c in rows if s == "BUILDING")
    s_b = sum(c for _, s, c in rows if s != "BUILDING")
    ma6 = math.floor(s_a / n_a / 100.0 * 1e6 + 0.5)
    mb6 = math.floor(s_b / n_b / 100.0 * 1e6 + 0.5)
    frac_a = n_a / (n_a + n_b)
    n_extreme = 0
    for b in range(1, 33):
        sa = na = sb = nb = 0
        for ok, _, cents in rows:
            if _hash01(f"{ok}perm{b}") < frac_a:
                sa += cents
                na += 1
            else:
                sb += cents
                nb += 1
        d6 = math.floor(sa / na / 100.0 * 1e6 + 0.5) - math.floor(
            sb / nb / 100.0 * 1e6 + 0.5
        )
        if abs(d6) >= abs(ma6 - mb6):
            n_extreme += 1
    [r] = _run(spark, "ml_permutation_test_ab")
    assert (r["n_a"], r["n_b"]) == (n_a, n_b)
    assert r["mean_a"] == _r6(ma6 / 1e6)
    assert r["obs_diff"] == _r6((ma6 - mb6) / 1e6)
    assert r["n_extreme"] == n_extreme
    assert r["p_value"] == _r6((1.0 + n_extreme) / 33.0)


def test_bm25_matches_python_reference(spark, con):
    terms = ("hash", "join", "stream")
    docs = con.execute(f"SELECT doc_id, text FROM '{SF}/documents.parquet'").fetchall()
    toks = {d: [w for w in t.lower().strip().split() if w] for d, t in docs}
    dl = {d: len(tk) for d, tk in toks.items()}
    n_docs = len(docs)
    avgdl = sum(dl.values()) / n_docs
    tf = {d: Counter(w for w in tk if w in terms) for d, tk in toks.items()}
    df = Counter(term for d in tf.values() for term in d)
    idf = {term: _r6(math.log((n_docs - df[term] + 0.5) / (df[term] + 0.5) + 1.0)) for term in df}
    scores = {}
    for d, cnt in tf.items():
        if not cnt:
            continue
        t6 = sum(
            _micro(
                _r6(
                    idf[term]
                    * (c * 2.2)
                    / (c + 1.2 * (0.25 + 0.75 * dl[d] / avgdl))
                )
            )
            for term, c in cnt.items()
        )
        scores[d] = (len(cnt), _r6(t6 / 1e6))
    expect = sorted(scores.items(), key=lambda kv: (-kv[1][1], kv[0]))[:15]
    got = [(r["doc_id"], (r["n_terms"], r["bm25"])) for r in _run(spark, "doc_bm25_topk")]
    assert got == expect


def test_source_kl_matches_python_reference(spark, con):
    rows = con.execute(f"SELECT source, text FROM '{SF}/documents.parquet'").fetchall()
    tc = defaultdict(Counter)
    for s, txt in rows:
        tc[s].update(w for w in txt.lower().strip().split() if w)
    tot = {s: sum(c.values()) for s, c in tc.items()}
    vocab = len({w for c in tc.values() for w in c})
    expect = {}
    srcs = sorted(tc)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            union = set(tc[a]) | set(tc[b])
            sab6 = sum(
                (tc[a][w] + 1) * _micro_ln((tc[a][w] + 1) / (tc[b][w] + 1)) for w in union
            )
            sba6 = sum(
                (tc[b][w] + 1) * _micro_ln((tc[b][w] + 1) / (tc[a][w] + 1)) for w in union
            )
            kl_ab = sab6 / 1e6 / (tot[a] + vocab) + _r6(
                math.log((tot[b] + vocab) / (tot[a] + vocab))
            )
            kl_ba = sba6 / 1e6 / (tot[b] + vocab) + _r6(
                math.log((tot[a] + vocab) / (tot[b] + vocab))
            )
            expect[(a, b)] = (len(union), _r6(kl_ab), _r6(kl_ba), _r6(kl_ab + kl_ba))
    got = {
        (r["src_a"], r["src_b"]): (r["n_union_tokens"], r["kl_ab"], r["kl_ba"], r["jeffreys"])
        for r in _run(spark, "doc_source_kl_divergence")
    }
    assert got == expect


_NORM_WS = re.compile(r"[\t\n\x0b\f\r ]+")  # Java \s (ASCII), as in norm_tokens


@pytest.fixture(scope="module")
def py_minhash_candidates(con):
    """Portable-MinHash candidate pairs from FIRST PRINCIPLES — pure
    Python sha256 h1/h2 linear-mix minima, 4-band bucketing, in-bucket
    pairing with signature-agreement estimates — NOT collected from the
    Spark op (the round-8 advice's independence gap). Returns
    {(id_a, id_b): jaccard_est} over the full candidate universe
    (threshold 0); consumers filter. The 8192 hot-block cap is asserted
    inert at this SF, so not mirrored."""
    docs = con.execute(f"SELECT doc_id, text FROM '{SF}/documents.parquet'").fetchall()
    buckets: dict = defaultdict(list)
    for did, text in docs:
        toks = _NORM_WS.sub(" ", text.strip(" ").lower()).split(" ")
        cnt = max(len(toks) - 2, 1)
        grams = {
            g
            for g in (
                " ".join(toks[i + off] for off in range(3) if i + off < len(toks))
                for i in range(cnt)
            )
            if g != ""
        }
        if not grams:
            continue
        hs = []
        for g in grams:
            hx = hashlib.sha256(g.encode()).hexdigest()
            hs.append((int(hx[:8], 16), int(hx[8:16], 16)))
        sig = [min(h1 + i * h2 for h1, h2 in hs) for i in range(16)]
        for b in range(4):
            bh = hashlib.sha256(
                "_".join(str(v) for v in sig[b * 4 : (b + 1) * 4]).encode()
            ).hexdigest()
            buckets[(b, bh)].append((did, sig))
    pairs: dict = {}
    for members in buckets.values():
        assert len(members) <= 8192, "hot-block cap would bind — mirror it here"
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                ia, sa = members[i]
                ib, sb = members[j]
                key = (min(ia, ib), max(ia, ib))
                if key not in pairs:
                    agree = sum(1 for u, v in zip(sa, sb) if u == v)
                    pairs[key] = agree / 16.0
    return pairs


def test_python_minhash_generator_matches_op(spark, py_minhash_candidates):
    """The first-principles generator and the registered op agree on
    the ENTIRE candidate universe (ids + estimates) — making every
    downstream consumer of the Python pairs end-to-end independent
    evidence for the op, not a circular copy of it."""
    from real_estate_data_pipeline_spark.ops import dedup
    from real_estate_data_pipeline_spark.queries import t

    d = t(spark, SF, "documents")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard_est"]
        for r in dedup.minhash_dup_pairs_portable(
            d, "doc_id", "text", num_perm=16, bands=4, jaccard_threshold=0.0
        ).collect()
    }
    assert got == py_minhash_candidates


def test_hits_matches_python_reference(spark, py_minhash_candidates):
    """2 HITS rounds in plain Python over the first-principles pair set
    (NOT collected from the Spark op — see py_minhash_candidates),
    checking pair generation AND the micro-unit/L1-normalization
    algebra of the unrolled Spark loop end to end."""
    edges = [k for k, est in py_minhash_candidates.items() if est >= 0.5]
    nodes = sorted({n for e in edges for n in e})
    a = {n: 1.0 for n in nodes}
    h = {}
    for _ in range(2):
        hraw = defaultdict(int)
        for s, dst in edges:
            hraw[s] += math.floor(_r6(a[dst]) * 1e6 + 0.5)
        tot = sum(hraw.values())
        h = {n: _r6(hraw.get(n, 0) / tot) for n in nodes}
        araw = defaultdict(int)
        for s, dst in edges:
            araw[dst] += math.floor(_r6(h[s]) * 1e6 + 0.5)
        tot = sum(araw.values())
        a = {n: _r6(araw.get(n, 0) / tot) for n in nodes}
    expect = sorted(((n, h[n], a[n]) for n in nodes), key=lambda x: (-x[2], x[0]))[:15]
    got = [(r["doc_id"], r["hub"], r["authority"]) for r in _run(spark, "graph_hits_rounds")]
    assert got == expect


def test_skyline_matches_brute_force(spark, con):
    """O(n^2) dominance check per brand — the definition, not the
    window identity the engines share."""
    parts = con.execute(
        f"""SELECT p_partkey, p_brand, p_size,
                   CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
            FROM '{SF}/part.parquet'"""
    ).fetchall()
    by_brand = defaultdict(list)
    for pk, b, sz, pc in parts:
        by_brand[b].append((pk, pc, sz))
    expect = []
    for b in sorted(by_brand):
        for pk, pc, sz in by_brand[b]:
            dominated = any(
                qc <= pc and qs >= sz and (qc < pc or qs > sz)
                for _, qc, qs in by_brand[b]
            )
            if not dominated:
                expect.append((b, pk, _r2(pc / 100.0), sz))
    expect.sort(key=lambda x: (x[0], x[2], x[1]))
    got = [
        (r["p_brand"], r["p_partkey"], r["price"], r["p_size"])
        for r in _run(spark, "part_skyline_by_brand")
    ]
    assert got == expect


def test_cms_matches_python_reference(spark, con):
    rows = con.execute(
        f"SELECT user_id, COUNT(*) FROM '{SF}/events.parquet' GROUP BY user_id"
    ).fetchall()
    uc = dict(rows)
    sketch = defaultdict(int)

    def cell(uid, r):
        return int(hashlib.sha256(f"{uid}cms{r}".encode()).hexdigest()[:8], 16) % 512

    for uid, c in uc.items():
        for r in range(4):
            sketch[(r, cell(uid, r))] += c
    top20 = sorted(uc.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    expect = [
        (uid, c, min(sketch[(r, cell(uid, r))] for r in range(4)))
        for uid, c in top20
    ]
    rows = _run(spark, "sketch_cms_user_counts")
    got = [(r["user_id"], r["exact_count"], r["cms_estimate"]) for r in rows]
    assert got == [(u, c, e) for u, c, e in expect]
    assert all(r["cms_estimate"] >= r["exact_count"] for r in rows)


def test_markov_accuracy_matches_python_reference(spark, con):
    rows = con.execute(
        f"SELECT user_id, ts, event_id, event_type FROM '{SF}/events.parquet' ORDER BY user_id, ts, event_id"
    ).fetchall()
    seqs = defaultdict(list)
    for uid, _, _, et in rows:
        seqs[uid].append(et)
    train_cnt = Counter()
    test_trans = []
    for uid, seq in seqs.items():
        is_train = _hash01(f"{uid}mkv") < 0.8
        for s, nxt in zip(seq, seq[1:]):
            if is_train:
                train_cnt[(s, nxt)] += 1
            else:
                test_trans.append((s, nxt))
    states = {s for s, _ in train_cnt}
    pred = {
        s: min(
            (t for (s2, t) in train_cnt if s2 == s),
            key=lambda t: (-train_cnt[(s, t)], t),
        )
        for s in states
    }
    agg = defaultdict(lambda: [0, 0])
    for s, nxt in test_trans:
        if s in pred:
            agg[(s, pred[s])][0] += 1
            if nxt == pred[s]:
                agg[(s, pred[s])][1] += 1
    got = {
        (r["state"], r["predicted_next"]): (r["n_test"], r["n_correct"], r["accuracy"])
        for r in _run(spark, "evt_markov_next_event_accuracy")
    }
    expect = {k: (n, c, _r6(c / n)) for k, (n, c) in agg.items()}
    assert got == expect


def test_winsorized_stats_matches_python_reference(spark, con):
    rows = con.execute(
        f"""SELECT c.c_mktsegment,
                   CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            FROM '{SF}/orders.parquet' o
            JOIN '{SF}/customer.parquet' c ON c.c_custkey = o.o_custkey"""
    ).fetchall()
    by_seg = defaultdict(list)
    for seg, cents in rows:
        by_seg[seg].append(cents)
    expect = {}
    for seg, vals in by_seg.items():
        sv = sorted(vals)
        lo = math.floor(_quantile_cont(sv, 0.05) + 0.5)
        hi = math.floor(_quantile_cont(sv, 0.95) + 0.5)
        wc = [min(max(v, lo), hi) for v in vals]
        n = len(vals)
        sw, sw2 = sum(wc), sum(v * v for v in wc)
        sd = math.sqrt((n * sw2 - sw * sw) / (n * (n - 1))) / 100.0
        expect[seg] = (
            n,
            _r2(min(wc) / 100.0),
            _r2(max(wc) / 100.0),
            _r6(sum(vals) / n / 100.0),
            _r6(sw / n / 100.0),
            _r6(sd),
        )
    got = {
        r["segment"]: (
            r["n_orders"],
            r["clamp_lo"],
            r["clamp_hi"],
            r["mean_raw"],
            r["mean_winsorized"],
            r["sd_winsorized"],
        )
        for r in _run(spark, "ml_winsorized_segment_stats")
    }
    assert got == expect


def test_fd_histogram_matches_python_reference(spark, con):
    [(n,)] = con.execute(f"SELECT COUNT(*) FROM '{SF}/orders.parquet'").fetchall()
    cents = sorted(
        c
        for (c,) in con.execute(
            f"""SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                FROM '{SF}/orders.parquet'"""
        ).fetchall()
    )
    q1 = _quantile_cont(cents, 0.25)
    q3 = _quantile_cont(cents, 0.75)
    w = max(math.floor(2.0 * (q3 - q1) / math.cbrt(n) + 0.5), 1)
    min_c = cents[0]
    hist = Counter(math.floor((c - min_c) / w) for c in cents)
    expect = [
        (b, _r2((min_c + b * w) / 100.0), hist[b]) for b in sorted(hist)
    ]
    got = [(r["bin_id"], r["bin_lo"], r["n_rows"]) for r in _run(spark, "dq_fd_auto_histogram")]
    assert got == expect


def test_nb_margin_calibration_matches_python_reference(spark, con):
    """Full NB from scratch: 0.7 hash split, Laplace likelihoods in
    rounded micro-nats, per-(doc, lang) score sums, argmax/runner-up
    margins, 5-band report — independent of both engines' join logic."""
    docs = con.execute(
        f"SELECT doc_id, lang, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    train, test = [], []
    for did, lang, txt in docs:
        tk = [w for w in txt.lower().strip().split() if w]
        (train if _hash01(f"{did}nb") < 0.7 else test).append((did, lang, tk))
    c = defaultdict(Counter)
    for _, lang, tk in train:
        c[lang].update(tk)
    tl = {lang: sum(cnt.values()) for lang, cnt in c.items()}
    vocab = len({w for cnt in c.values() for w in cnt})
    nd = Counter(lang for _, lang, _ in train)
    langs = sorted(nd)
    prior = {lang: _micro_ln(nd[lang] / len(train)) for lang in langs}
    agg = defaultdict(lambda: [0, 0, 0])
    for did, true_lang, tk in test:
        scores = {}
        for lang in langs:
            s = prior[lang] + sum(
                _micro_ln((c[lang].get(w, 0) + 1.0) / (tl[lang] + vocab)) for w in tk
            )
            scores[lang] = s
        ranked = sorted(langs, key=lambda g: (-scores[g], g))
        pred, runner = ranked[0], ranked[1]
        m6 = scores[pred] - scores[runner]
        band = (
            "0: <1" if m6 < 1_000_000
            else "1: 1-2" if m6 < 2_000_000
            else "2: 2-4" if m6 < 4_000_000
            else "3: 4-8" if m6 < 8_000_000
            else "4: 8+"
        )
        agg[band][0] += 1
        agg[band][1] += m6
        agg[band][2] += int(pred == true_lang)
    expect = {
        band: (n, _r6(s6 / n / 1e6), _r6(ok / n)) for band, (n, s6, ok) in agg.items()
    }
    got = {
        r["margin_band"]: (r["n_docs"], r["mean_margin_nats"], r["accuracy"])
        for r in _run(spark, "ml_nb_margin_calibration")
    }
    assert got == expect


def test_lift_curve_matches_python_reference(spark, con):
    """NTILE semantics from scratch (first n%10 deciles get the extra
    row), plus the gains/lift arithmetic."""
    import datetime

    cut = datetime.datetime(2024, 1, 21)
    rows = con.execute(
        f"SELECT user_id, ts, event_type FROM '{SF}/events.parquet'"
    ).fetchall()
    score = Counter(
        u for u, ts, et in rows if ts < cut and et in ("click", "view")
    )
    post = {u for u, ts, et in rows if ts >= cut and et == "purchase"}
    users = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))
    n = len(users)
    base, extra = divmod(n, 10)
    deciles = defaultdict(lambda: [0, 0])
    i = 0
    for d in range(1, 11):
        size = base + (1 if d <= extra else 0)
        for u, _ in users[i : i + size]:
            deciles[d][0] += 1
            deciles[d][1] += int(u in post)
        i += size
    nu = sum(v[0] for v in deciles.values())
    nc = sum(v[1] for v in deciles.values())
    cum = 0
    expect = []
    for d in sorted(deciles):
        du, dc = deciles[d]
        cum += dc
        expect.append(
            (
                d,
                du,
                dc,
                _r6(dc / du),
                _r6(cum / nc) if nc else None,
                _r6((dc / du) / (nc / nu)) if nc else None,
            )
        )
    got = [
        (
            r["decile"],
            r["n_users"],
            r["n_converters"],
            r["conv_rate"],
            r["cum_gain_share"],
            r["lift"],
        )
        for r in _run(spark, "ml_lift_curve_deciles")
    ]
    assert got == expect


def test_er_golden_records_matches_python_reference(spark, con):
    """Full ER pipeline from scratch: planted twins, DP Levenshtein
    inside (brand, length) blocks, union-find closure, survivorship
    aggregate — independent of both engines' join/recursion logic."""
    parts = con.execute(
        f"""SELECT p_partkey, p_name, p_brand, p_size,
                   CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
            FROM '{SF}/part.parquet'"""
    ).fetchall()
    base = [(pk, nm, b, sz, pc) for pk, nm, b, sz, pc in parts]
    base += [
        (pk + 1000000, "z" + nm[1:], b, sz, pc)
        for pk, nm, b, sz, pc in parts
        if pk % 7 == 0
    ]

    def lev_le1(a: str, b: str) -> bool:
        # equal length (blocked): distance <= 1 iff <= 1 substitution
        return sum(x != y for x, y in zip(a, b)) <= 1

    blocks = defaultdict(list)
    for row in base:
        blocks[(row[2], len(row[1]))].append(row)
    # mirror ops/pairs' hot-block cap: oversized blocks keep only their
    # smallest-id members (a no-op at sf0.001, but the semantics the
    # Spark op AND the SQL oracle now share at every scale) — import the
    # constant so a future cap tune moves all three implementations
    from real_estate_data_pipeline_spark.ops.pairs import DEFAULT_MAX_BLOCK

    blocks = {
        k: sorted(v, key=lambda r: r[0])[:DEFAULT_MAX_BLOCK]
        for k, v in blocks.items()
    }
    parent = {row[0]: row[0] for row in base}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for rows in blocks.values():
        for i, a in enumerate(rows):
            for b in rows[i + 1 :]:
                if lev_le1(a[1], b[1]):
                    ra, rb = find(a[0]), find(b[0])
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    clusters = defaultdict(list)
    for row in base:
        clusters[find(row[0])].append(row)
    expect = []
    for rows in clusters.values():
        if len(rows) < 2:
            continue
        rows.sort()
        expect.append(
            (
                rows[0][0],
                rows[0][2],
                len(rows),
                rows[0][1],
                max(r[3] for r in rows),
                _r2(min(r[4] for r in rows) / 100.0),
            )
        )
    expect.sort()
    got = [
        (
            r["canonical_id"],
            r["brand"],
            r["n_members"],
            r["canonical_name"],
            r["max_size"],
            r["min_price"],
        )
        for r in _run(spark, "er_part_golden_records")
    ]
    assert got == expect


def test_sliding_median_matches_python_reference(spark, con):
    raw = con.execute(
        f"SELECT event_type, ts, value FROM '{SF}/events.parquet'"
    ).fetchall()
    # bucket + cents from first principles: quantize each value to 2 dp
    # (the DECIMAL(18,2) cast) and sum exact cents per (type, hour)
    sums = defaultdict(int)
    for et, ts, val in raw:
        h = ts.replace(minute=0, second=0, microsecond=0)
        cents = int(
            (Decimal(repr(val)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP))
            * 100
        )
        sums[(et, h)] += cents
    series = defaultdict(list)
    for (et, h) in sorted(sums):
        series[et].append((h, sums[(et, h)]))
    expect = []
    for et in sorted(series):
        pts = series[et]
        for i, (h, cents) in enumerate(pts):
            frame = sorted(c for _, c in pts[max(0, i - 3) : i + 4])
            med = _quantile_cont(frame, 0.5)
            expect.append(
                (et, h.strftime("%Y-%m-%d %H:%M:%S"), cents / 100.0, _r6(med / 100.0))
            )
    got = [
        (r["event_type"], r["hour_ts"], r["total_value"], r["rolling_median"])
        for r in _run(spark, "evt_sliding_median_hourly")
    ]
    assert got == expect


def test_quartile_migration_matches_python_reference(spark, con):
    import datetime

    rows = con.execute(
        f"""SELECT o_custkey, o_orderdate,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            FROM '{SF}/orders.parquet'
            WHERE o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate < TIMESTAMP '1996-01-01'"""
    ).fetchall()
    cut = datetime.datetime(1995, 7, 1)
    rev = defaultdict(lambda: defaultdict(int))
    for ck, od, cents in rows:
        rev["h1" if od < cut else "h2"][ck] += cents

    def ntile4(period):
        users = sorted(rev[period].items(), key=lambda kv: (-kv[1], kv[0]))
        n = len(users)
        base, extra = divmod(n, 4)
        seg, i = {}, 0
        for q in range(1, 5):
            size = base + (1 if q <= extra else 0)
            for ck, _ in users[i : i + size]:
                seg[ck] = f"Q{q}"
            i += size
        return seg

    s1, s2 = ntile4("h1"), ntile4("h2")
    mat = Counter(
        (s1.get(ck, "none"), s2.get(ck, "none")) for ck in set(s1) | set(s2)
    )
    got = {
        (r["seg_from"], r["seg_to"]): r["n_customers"]
        for r in _run(spark, "cust_value_quartile_migration")
    }
    assert got == dict(mat)


def test_link_prediction_cn_matches_python_reference(spark, py_minhash_candidates):
    """Hold-out split, retained adjacency, and common-neighbor counts
    re-derived in plain Python over the FIRST-PRINCIPLES candidate set
    (not collected from the Spark op), so pair generation is covered
    end to end too."""
    cand = [(a, b, e) for (a, b), e in py_minhash_candidates.items()]
    pos = [(a, b) for a, b, e in cand if e >= 0.5]
    neg = [(a, b) for a, b, e in cand if e < 0.5]
    test = [(a, b) for a, b in pos if _hash01(f"{a}_{b}lp") < 0.2]
    retained = [(a, b) for a, b in pos if _hash01(f"{a}_{b}lp") >= 0.2]
    nbrs = defaultdict(set)
    for a, b in retained:
        nbrs[a].add(b)
        nbrs[b].add(a)
    expect = {}
    for side, pairs in (("positive", test), ("negative", neg)):
        assert pairs, f"fixture produced no {side} pairs — split/threshold changed"
        cns = [len(nbrs[a] & nbrs[b]) for a, b in pairs]
        expect[side] = (
            len(pairs),
            _r6(sum(cns) / len(pairs)),
            _r6(sum(1 for c in cns if c >= 1) / len(pairs)),
        )
    got = {
        r["side"]: (r["n_pairs"], r["mean_common_neighbors"], r["share_with_cn"])
        for r in _run(spark, "graph_link_prediction_cn_eval")
    }
    assert got == expect


def test_bloom_fpr_matches_python_reference(spark, con):
    ids = [d for (d,) in con.execute(f"SELECT doc_id FROM '{SF}/documents.parquet'").fetchall()]

    def cell(did, r):
        return int(hashlib.sha256(f"{did}bloom{r}".encode()).hexdigest()[:8], 16) % 4096

    train = [d for d in ids if _hash01(f"{d}bl") < 0.7]
    probe = [d for d in ids if _hash01(f"{d}bl") >= 0.7]
    bits = {cell(d, r) for d in train for r in range(3)}
    fp = sum(1 for d in probe if all(cell(d, r) in bits for r in range(3)))
    fill = len(bits) / 4096.0
    [r] = _run(spark, "sketch_bloom_fpr_report")
    assert (r["n_train"], r["n_probes"], r["bits_set"]) == (len(train), len(probe), len(bits))
    assert r["n_false_positives"] == fp
    assert r["fill_ratio"] == _r6(fill)
    assert r["observed_fpr"] == _r6(fp / len(probe))
    assert r["expected_fpr"] == _r6(fill * fill * fill)
