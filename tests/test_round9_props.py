"""Independent Python references for the round-9 operators. Spark ==
DuckDB is proven by the parity suite; these prove both == a third
implementation built from first principles — including the BM25/QL
scorers rebuilt from raw text in pure Python, so the ranker-pair
diagnostics (RRF, Kendall tau, average overlap, MRR) are end-to-end
independent: the rank lists they consume are NOT collected from the
Spark ops (the round-8 advice's independence gap, closed here for the
new family). The isotonic test is the strongest of the set: the engine
computes the fit via the max-min identity, the reference runs the
classic sequential pool-adjacent-violators loop — two different
algorithms that provably agree.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest

SF = "/root/testdata/sf0.001"

_TERMS = ("hash", "join", "stream")
_WS = re.compile(r"[\t\n\x0b\f\r ]+")  # Java \s (ASCII) — matches F.split


def _run(spark, name, sf=SF):
    from real_estate_data_pipeline_spark.queries import CATALOG

    return CATALOG[name].fn(spark, sf).collect()


def _r6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def _r9(x: float) -> float:
    return float(
        Decimal(repr(x)).quantize(Decimal("0.000000001"), rounding=ROUND_HALF_UP)
    )


def _micro(x: float) -> int:
    """floor(round(x, 6) * 1e6 + 0.5) — the micro-unit snap."""
    return math.floor(_r6(x) * 1e6 + 0.5)


def _micro_ln(x: float) -> int:
    """CAST(round(round(ln(x), 6) * 1e6) AS BIGINT)."""
    return int(round(_r6(math.log(x)) * 1e6))


def _quantile_cont(sorted_vals, q: float) -> float:
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


# ---------------------------------------------------------------------------
# pure-Python lexical retrieval: tokenize -> BM25 + Dirichlet-QL scores
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def scores(con):
    docs = con.execute(f"SELECT doc_id, text FROM '{SF}/documents.parquet'").fetchall()
    tk = {d: [w for w in _WS.split(t.lower()) if w] for d, t in docs}
    dl = {d: len(v) for d, v in tk.items()}
    n_docs = len(dl)
    avgdl = sum(dl.values()) / n_docs
    qtf = {
        (d, w): c
        for d, v in tk.items()
        for w, c in Counter(x for x in v if x in _TERMS).items()
    }
    df = Counter(w for (_, w) in qtf)
    idf = {w: _r6(math.log((n_docs - df[w] + 0.5) / (df[w] + 0.5) + 1.0)) for w in df}
    b6 = Counter()
    n_terms = Counter()
    for (d, w), tf in qtf.items():
        b6[d] += _micro(
            _r6(idf[w] * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl[d] / avgdl)))
        )
        n_terms[d] += 1
    nc = sum(dl.values())
    cf = Counter()
    for (_, w), tf in qtf.items():
        cf[w] += tf
    q6 = Counter()
    n_hits = Counter()
    for d in dl:
        for w in cf:
            tf = qtf.get((d, w), 0)
            q6[d] += _micro_ln((tf + 2000.0 * cf[w] / nc) / (dl[d] + 2000.0))
            if tf:
                n_hits[d] += 1
    return {
        "b6": dict(b6),
        "n_terms": dict(n_terms),
        "q6": dict(q6),
        "n_hits": dict(n_hits),
        "qtf": qtf,
        "n_docs": n_docs,
    }


def _ranked(score_map, n):
    """Top-n [(doc_id, rank)] by (score desc, doc_id) — rank from 1."""
    order = sorted(score_map, key=lambda d: (-score_map[d], d))[:n]
    return {d: i + 1 for i, d in enumerate(order)}


def test_dirichlet_ql_matches_python_reference(spark, scores):
    got = _run(spark, "doc_dirichlet_query_likelihood")
    exp = sorted(scores["q6"], key=lambda d: (-scores["q6"][d], d))[:15]
    assert [r["doc_id"] for r in got] == exp
    for r in got:
        assert r["ql"] == _r6(scores["q6"][r["doc_id"]] / 1e6)
        assert r["n_hits"] == scores["n_hits"].get(r["doc_id"], 0)


def test_rrf_fusion_matches_python_reference(spark, scores):
    ra = _ranked(scores["b6"], 20)
    rb = _ranked(scores["q6"], 20)
    fused = {}
    for d in set(ra) | set(rb):
        s = (1.0 / (60 + ra[d]) if d in ra else 0.0) + (
            1.0 / (60 + rb[d]) if d in rb else 0.0
        )
        fused[d] = (ra.get(d, 0), rb.get(d, 0), _r9(s))
    order = sorted(fused, key=lambda d: (-fused[d][2], d))[:10]
    got = _run(spark, "doc_ranker_rrf_fusion")
    assert [r["doc_id"] for r in got] == order
    for r in got:
        rb25, rql, rrf = fused[r["doc_id"]]
        assert (r["rank_bm25"], r["rank_ql"], r["rrf"]) == (rb25, rql, rrf)


def test_kendall_tau_matches_python_reference(spark, scores):
    ra = _ranked(scores["b6"], 20)
    rb_order = sorted(ra, key=lambda d: (-scores["q6"][d], d))
    rb = {d: i + 1 for i, d in enumerate(rb_order)}
    docs = sorted(ra, key=lambda d: ra[d])
    conc = sum(
        1
        for i in range(len(docs))
        for j in range(i + 1, len(docs))
        if rb[docs[j]] > rb[docs[i]]
    )
    n_pairs = len(docs) * (len(docs) - 1) // 2
    [r] = _run(spark, "doc_ranker_kendall_tau")
    assert (r["n_docs"], r["n_pairs"], r["n_concordant"]) == (len(docs), n_pairs, conc)
    assert r["n_discordant"] == n_pairs - conc
    assert r["kendall_tau"] == _r6((conc - (n_pairs - conc)) / float(n_pairs))
    assert -1.0 <= r["kendall_tau"] <= 1.0


def test_average_overlap_matches_python_reference(spark, scores):
    from real_estate_data_pipeline_spark.queries import _AO_W

    ra = _ranked(scores["b6"], 10)
    rb = _ranked(scores["q6"], 10)
    common = set(ra) & set(rb)
    ao_num = sum(_AO_W[max(ra[d], rb[d])] for d in common)
    [r] = _run(spark, "doc_ranker_average_overlap")
    assert (r["n_common"], r["ao_num"]) == (len(common), ao_num)
    assert r["average_overlap"] == _r6(ao_num / 25200.0)
    # suffix-sum integrity of the weight table: w(m) - w(m+1) == 2520/m
    assert all(_AO_W[m] - _AO_W.get(m + 1, 0) == 2520 // m for m in range(1, 11))


def test_boolean_and_matches_python_reference(spark, scores):
    per_doc = Counter()
    total = Counter()
    for (d, _), tf in scores["qtf"].items():
        per_doc[d] += 1
        total[d] += tf
    hits = [d for d in per_doc if per_doc[d] == len(_TERMS)]
    order = sorted(hits, key=lambda d: (-total[d], d))[:20]
    got = _run(spark, "doc_boolean_retrieval_and")
    assert [r["doc_id"] for r in got] == order
    for r in got:
        assert sum(r[f"tf_{t}"] for t in _TERMS) == r["total_tf"] == total[r["doc_id"]]


def test_mrr_eval_matches_python_reference(spark, scores):
    per_doc = Counter()
    for (d, _), _ in scores["qtf"].items():
        per_doc[d] += 1
    rel = {d for d in per_doc if per_doc[d] == len(_TERMS)}
    ra = _ranked(scores["b6"], 20)
    hits5 = sum(1 for d, r in ra.items() if d in rel and r <= 5)
    hits10 = sum(1 for d, r in ra.items() if d in rel and r <= 10)
    hits20 = sum(1 for d in ra if d in rel)
    frr = min((r for d, r in ra.items() if d in rel), default=0)
    [r] = _run(spark, "doc_retrieval_mrr_eval")
    assert (r["n_relevant"], r["hits_at_5"], r["hits_at_10"], r["hits_at_20"]) == (
        len(rel),
        hits5,
        hits10,
        hits20,
    )
    assert r["p_at_5"] == _r6(hits5 / 5.0)
    assert r["p_at_10"] == _r6(hits10 / 10.0)
    assert r["first_rel_rank"] == frr
    assert r["mrr"] == (_r6(1.0 / frr) if frr else 0.0)
    if rel:
        assert r["recall_at_20"] == _r6(float(hits20) / len(rel))


# ---------------------------------------------------------------------------
# sketches / vocabulary
# ---------------------------------------------------------------------------


def test_cms_merge_equivalence_is_exact(spark, con):
    rows = _run(spark, "sketch_cms_merge_equivalence")
    assert [r["r"] for r in rows] == [0, 1, 2, 3]
    [(n_events,)] = con.execute(
        f"SELECT COUNT(*) FROM '{SF}/events.parquet'"
    ).fetchall()
    for r in rows:
        assert r["n_diff_cells"] == 0 and r["max_abs_diff"] == 0
        # every sketch row carries the full stream mass
        assert r["mass_merged"] == r["mass_direct"] == n_events
        assert r["cells_merged"] == r["cells_direct"] <= 512


def test_chao1_and_simpson_match_python_reference(spark, con):
    docs = con.execute(f"SELECT source, text FROM '{SF}/documents.parquet'").fetchall()
    tc: dict[str, Counter] = {}
    for src, text in docs:
        tc.setdefault(src, Counter()).update(w for w in _WS.split(text.lower()) if w)
    chao = {r["source"]: r for r in _run(spark, "doc_vocab_chao1_richness")}
    simp = {r["source"]: r for r in _run(spark, "doc_token_simpson_diversity")}
    assert set(chao) == set(tc) == set(simp)
    for src, cnt in tc.items():
        v = len(cnt)
        f1 = sum(1 for c in cnt.values() if c == 1)
        f2 = sum(1 for c in cnt.values() if c == 2)
        r = chao[src]
        assert (r["v_obs"], r["f1"], r["f2"]) == (v, f1, f2)
        assert r["chao1"] == _r6(v + f1 * float(f1 - 1) / (2 * (f2 + 1)))
        n = sum(cnt.values())
        same2 = sum(c * (c - 1) for c in cnt.values())
        s = simp[src]
        assert (s["n_tokens"], s["v_obs"]) == (n, v)
        assert s["simpson"] == _r6(float(same2) / (n * float(n - 1)))
        if same2:
            assert s["inv_simpson"] == _r6(n * float(n - 1) / float(same2))


# ---------------------------------------------------------------------------
# rank statistics
# ---------------------------------------------------------------------------


def test_mann_whitney_matches_python_reference(spark, con):
    rows = con.execute(
        f"""SELECT l_returnflag, CAST(l_quantity AS BIGINT)
            FROM '{SF}/lineitem.parquet' WHERE l_returnflag IN ('R', 'N')"""
    ).fetchall()
    c1 = Counter(q for f, q in rows if f == "R")
    c2 = Counter(q for f, q in rows if f == "N")
    nr, nn = sum(c1.values()), sum(c2.values())
    u2x = tsum = 0
    cum2 = 0
    for v in sorted(set(c1) | set(c2)):
        n1, n2 = c1.get(v, 0), c2.get(v, 0)
        u2x += n1 * (2 * cum2 + n2)
        t = n1 + n2
        tsum += t * t * t - t
        cum2 += n2
    var_u = (
        nr
        * float(nn)
        / 12.0
        * ((nr + nn + 1) - float(tsum) / ((nr + nn) * (nr + nn - 1.0)))
    )
    [r] = _run(spark, "ml_mann_whitney_u_quantity")
    assert (r["n_r"], r["n_n"]) == (nr, nn)
    assert r["u_stat"] == u2x / 2.0
    assert r["mu_u"] == nr * float(nn) / 2.0
    assert r["var_u"] == _r6(var_u)
    assert r["z"] == _r6((u2x / 2.0 - nr * float(nn) / 2.0) / math.sqrt(var_u))


def test_spearman_matches_python_reference(spark, con):
    rows = con.execute(
        f"""SELECT l_returnflag, CAST(l_quantity AS BIGINT),
                   CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)
            FROM '{SF}/lineitem.parquet'"""
    ).fetchall()
    got = {r["l_returnflag"]: r for r in _run(spark, "ml_spearman_qty_discount")}
    flags = sorted({f for f, _, _ in rows})
    assert sorted(got) == flags
    for flag in flags:
        sub = [(q, d) for f, q, d in rows if f == flag]
        n = len(sub)

        def _r2map(vals):
            cnt = Counter(vals)
            out, cum = {}, 0
            for v in sorted(cnt):
                out[v] = 2 * cum + cnt[v] + 1
                cum += cnt[v]
            return out, sum(c * c * c - c for c in cnt.values())

        rq, tq = _r2map([q for q, _ in sub])
        rd, td = _r2map([d for _, d in sub])
        sd2 = sum((rq[q] - rd[d]) ** 2 for q, d in sub)
        n3n = n * n * n - n
        a, b = n3n - tq, n3n - td
        rho = (float(a) + float(b) - 3.0 * sd2) / (2 * math.sqrt(float(a) * float(b)))
        r = got[flag]
        assert r["n_rows"] == n
        assert r["rho_spearman"] == _r6(rho)


def test_runs_test_matches_python_reference(spark, con):
    rows = con.execute(
        f"""SELECT CAST(ts AS DATE) AS day, COUNT(*) AS c
            FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    nd = len(rows)
    total = sum(c for _, c in rows)
    signs = [1 if c * nd > total else 0 for _, c in rows]
    n1 = sum(signs)
    n2 = nd - n1
    runs = 1 + sum(1 for i in range(1, nd) if signs[i] != signs[i - 1])
    [r] = _run(spark, "evt_runs_test_daily")
    assert (r["n_days"], r["n_above"], r["n_below"], r["n_runs"]) == (nd, n1, n2, runs)
    e_runs = 1 + 2.0 * n1 * n2 / nd
    assert r["e_runs"] == _r6(e_runs)
    var_r = 2.0 * n1 * n2 * (2 * n1 * n2 - nd) / (nd * nd * (nd - 1.0))
    if var_r > 0:
        assert r["z"] == _r6((runs - e_runs) / math.sqrt(var_r))


# ---------------------------------------------------------------------------
# robust ML: PAVA by a DIFFERENT algorithm; IRLS replicated step-for-step
# ---------------------------------------------------------------------------


def test_isotonic_matches_sequential_pava(spark, con):
    rows = con.execute(
        f"""SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT),
                   CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
            FROM '{SF}/orders.parquet'"""
    ).fetchall()
    cents = sorted(c for c, _ in rows)
    edges = [_quantile_cont(cents, q / 10.0) for q in range(1, 10)]
    bins: dict[int, list[int]] = {}
    for c, y in rows:
        b = 1 + sum(1 for e in edges if c > e)
        n, s = bins.get(b, [0, 0])
        bins[b] = [n + 1, s + y]
    order = sorted(bins)
    # classic sequential pool-adjacent-violators (NOT the max-min form
    # the engines use): merge any adjacent blocks whose means decrease
    blocks = [[bins[b][0], bins[b][1], [b]] for b in order]
    merged = True
    while merged:
        merged = False
        for i in range(len(blocks) - 1):
            n1, s1, _ = blocks[i]
            n2, s2, _ = blocks[i + 1]
            if s1 * n2 > s2 * n1:  # mean decreases: pool (integer compare)
                blocks[i] = [n1 + n2, s1 + s2, blocks[i][2] + blocks[i + 1][2]]
                del blocks[i + 1]
                merged = True
                break
    iso = {}
    for n, s, members in blocks:
        for b in members:
            iso[b] = float(s) / n
    got = _run(spark, "ml_isotonic_urgent_rate")
    assert [r["bin_id"] for r in got] == order
    prev = -1.0
    for r in got:
        n, s = bins[r["bin_id"]]
        assert r["n_orders"] == n
        assert r["urgent_rate_raw"] == _r6(float(s) / n)
        assert r["urgent_rate_iso"] == _r6(iso[r["bin_id"]])
        assert r["urgent_rate_iso"] >= prev  # monotone by construction
        prev = r["urgent_rate_iso"]


def test_kruskal_wallis_matches_python_reference(spark, con):
    rows = con.execute(
        f"""SELECT l_returnflag, CAST(l_quantity AS BIGINT)
            FROM '{SF}/lineitem.parquet'"""
    ).fetchall()
    per_v: dict = {}
    for f, q in rows:
        per_v.setdefault(q, Counter())[f] += 1
    n = len(rows)
    cum = 0
    r2sum = Counter()
    tsum = 0
    for v in sorted(per_v):
        cnt = sum(per_v[v].values())
        r2 = 2 * cum + cnt + 1
        for f, c in per_v[v].items():
            r2sum[f] += c * r2
        tsum += cnt * cnt * cnt - cnt
        cum += cnt
    ng = Counter(f for f, _ in rows)
    h = (
        12.0
        / (n * (n + 1.0))
        * (
            (r2sum["A"] / 2.0) * (r2sum["A"] / 2.0) / ng["A"]
            + (r2sum["N"] / 2.0) * (r2sum["N"] / 2.0) / ng["N"]
            + (r2sum["R"] / 2.0) * (r2sum["R"] / 2.0) / ng["R"]
        )
        - 3.0 * (n + 1.0)
    )
    tc = 1.0 - float(tsum) / float(n * n * n - n)
    [r] = _run(spark, "ml_kruskal_wallis_quantity")
    assert (r["n_total"], r["n_a"], r["n_n"], r["n_r"]) == (n, ng["A"], ng["N"], ng["R"])
    assert r["h_stat"] == _r6(h)
    assert r["tie_correction"] == _r6(tc)
    assert r["h_corrected"] == _r6(h / tc)


def test_ks_two_sample_matches_python_reference(spark, con):
    rows = con.execute(
        f"""SELECT l_returnflag, CAST(l_quantity AS BIGINT)
            FROM '{SF}/lineitem.parquet' WHERE l_returnflag IN ('R', 'N')"""
    ).fetchall()
    c1 = Counter(q for f, q in rows if f == "R")
    c2 = Counter(q for f, q in rows if f == "N")
    n1, n2 = sum(c1.values()), sum(c2.values())
    cum1 = cum2 = 0
    best_num, best_v = -1, None
    for v in sorted(set(c1) | set(c2)):
        cum1 += c1.get(v, 0)
        cum2 += c2.get(v, 0)
        num = abs(cum1 * n2 - cum2 * n1)
        if num > best_num:
            best_num, best_v = num, v
    d = float(best_num) / (n1 * float(n2))
    [r] = _run(spark, "ml_ks_two_sample_quantity")
    assert (r["n_r"], r["n_n"], r["at_value"]) == (n1, n2, best_v)
    assert r["d_stat"] == _r6(d)
    assert r["ks_stat"] == _r6(d * math.sqrt(n1 * float(n2) / (n1 + n2)))


def test_poisson_dispersion_matches_python_reference(spark, con):
    rows = con.execute(
        f"""SELECT CAST(ts AS DATE), COUNT(*) FROM '{SF}/events.parquet'
            GROUP BY 1"""
    ).fetchall()
    n = len(rows)
    s1 = sum(c for _, c in rows)
    s2 = sum(c * c for _, c in rows)
    num = n * s2 - s1 * s1
    [r] = _run(spark, "evt_poisson_dispersion_daily")
    assert (r["n_days"], r["total_events"]) == (n, s1)
    assert r["mean_daily"] == _r6(s1 / float(n))
    assert r["var_daily"] == _r6(num / (n * (n - 1.0)))
    assert r["dispersion_index"] == _r6(num / ((n - 1.0) * s1))
    assert r["chi2"] == _r6(num / float(s1))


_LANG_WORDS = {
    "en": ("the", "and", "of", "to", "in", "a", "is"),
    "es": ("el", "la", "de", "que", "y", "los", "es"),
    "de": ("der", "die", "und", "das", "ein", "ist", "nicht"),
    "fr": ("le", "la", "et", "les", "des", "un", "est"),
}


def _py_lang_id(text: str) -> str:
    s = {
        lang: len(re.findall(r"\b(?:%s)\b" % "|".join(ws), text.lower()))
        for lang, ws in _LANG_WORDS.items()
    }
    if sum(s.values()) == 0:
        return "und"
    for lang in ("en", "es", "de"):
        if all(s[lang] >= s[o] for o in list(s)[list(s).index(lang) + 1 :]):
            return lang
    return "fr"


def test_cohens_kappa_matches_python_reference(spark, con):
    """NB rebuilt from scratch (the r8 margin-test recipe) + the
    stopword heuristic rebuilt from its word lists: both raters'
    predictions, the marginal-product sum, and kappa all re-derived
    independently."""
    import hashlib
    from collections import defaultdict

    def _hash01(key: str) -> float:
        return int(hashlib.sha256(key.encode()).hexdigest()[:8], 16) / 4294967296.0

    docs = con.execute(
        f"SELECT doc_id, lang, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    train, test = [], []
    for did, lang, txt in docs:
        tk = [w for w in txt.lower().strip().split() if w]
        (train if _hash01(f"{did}nb") < 0.7 else test).append((did, lang, tk, txt))
    c = defaultdict(Counter)
    for _, lang, tk, _ in train:
        c[lang].update(tk)
    tl = {lang: sum(cnt.values()) for lang, cnt in c.items()}
    vocab = len({w for cnt in c.values() for w in cnt})
    nd = Counter(lang for _, lang, _, _ in train)
    langs = sorted(nd)
    prior = {lang: _micro_ln(nd[lang] / len(train)) for lang in langs}
    pairs = []
    for did, _, tk, txt in test:
        scores = {
            lang: prior[lang]
            + sum(_micro_ln((c[lang].get(w, 0) + 1.0) / (tl[lang] + vocab)) for w in tk)
            for lang in langs
        }
        nb = sorted(langs, key=lambda g: (-scores[g], g))[0]
        pairs.append((nb, _py_lang_id(txt)))
    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    ma = Counter(a for a, _ in pairs)
    mb = Counter(b for _, b in pairs)
    s = sum(ma[cls] * mb.get(cls, 0) for cls in ma)
    [r] = _run(spark, "ml_cohens_kappa_lang")
    assert (r["n_docs"], r["n_agree"], r["marginal_product_sum"]) == (n, agree, s)
    assert r["observed_agreement"] == _r6(agree / float(n))
    assert r["expected_agreement"] == _r6(s / (n * float(n)))
    assert r["cohens_kappa"] == _r6(float(n * agree - s) / (n * n - s))


def test_silhouette_matches_python_reference(spark, con):
    rows = con.execute(
        f"SELECT vec_id, label, embedding FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    by_label: dict = {}
    for _, lab, emb in rows:
        by_label.setdefault(lab, []).append(emb)
    cent = {
        lab: [_r6(sum(float(e[i]) for e in embs) / len(embs)) for i in range(64)]
        for lab, embs in by_label.items()
    }
    agg: dict = {}
    for _, lab, emb in rows:
        d2 = {
            cl: sum(_micro((float(x) - c) * (float(x) - c)) for x, c in zip(emb, cv))
            for cl, cv in cent.items()
        }
        own = d2[lab]
        other = min(v for cl, v in d2.items() if cl != lab)
        a, b = math.sqrt(own / 1e6), math.sqrt(other / 1e6)
        # max(a,b)==0 maps to SQL NULLIF -> s6 NULL: SUM skips it (== +0)
        # but COUNT(*) still counts the row and NULL>0 is false
        s6 = 0 if max(a, b) == 0 else _micro((b - a) / max(a, b))
        n, tot, pos = agg.get(lab, (0, 0, 0))
        agg[lab] = (n + 1, tot + s6, pos + (1 if s6 > 0 else 0))
    got = {r["label"]: r for r in _run(spark, "emb_silhouette_by_label")}
    assert set(got) == set(agg)
    for lab, (n, tot, pos) in agg.items():
        r = got[lab]
        assert r["n_vecs"] == n
        assert r["mean_silhouette"] == _r6(tot / n / 1e6)
        assert r["n_positive"] == pos


def test_page_hinkley_matches_python_reference(spark, con):
    rows = con.execute(
        f"""SELECT event_type, date_trunc('hour', ts) AS h,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
            FROM '{SF}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"""
    ).fetchall()
    series: dict = {}
    for et, h, c in rows:
        series.setdefault(et, []).append((h, int(c)))
    got = {r["event_type"]: r for r in _run(spark, "evt_page_hinkley_hourly")}
    assert set(got) == set(series)
    for et, pts in series.items():
        s = u = 0
        run_min = 0
        best, best_h = -1, None
        for i, (h, c) in enumerate(pts, start=1):
            s += c
            u += c * 1000000 - math.floor(s * 1000000.0 / i) - 100000000
            run_min = min(run_min, u)
            ph = u - run_min
            if ph > best:
                best, best_h = ph, h
        r = got[et]
        assert r["n_hours"] == len(pts)
        assert r["ph_max_value"] == _r6(best / 1e8)
        assert r["alarm_hour"] == best_h.strftime("%Y-%m-%d %H:%M:%S")
        assert r["alarm"] == (best / 1e8 >= 1000.0)


def test_gini_split_ranking_matches_python_reference(spark, con):
    rows = con.execute(
        f"""SELECT l_linestatus, CAST(l_quantity AS BIGINT),
                   CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT),
                   l_returnflag
            FROM '{SF}/lineitem.parquet'"""
    ).fetchall()

    def qband(q):
        return "q1_10" if q <= 10 else "q11_25" if q <= 25 else "q26_40" if q <= 40 else "q41_50"

    feats = {
        "linestatus": lambda r: r[0],
        "qty_band": lambda r: qband(r[1]),
        "disc_cents": lambda r: str(r[2]),
    }
    n = len(rows)
    root_c = Counter(r[3] for r in rows)
    g_root = (float(n) * n - sum(c * c for c in root_c.values())) / n / n
    out = _run(spark, "ml_gini_split_ranking")
    got = {r["feature"]: r for r in out}
    assert set(got) == set(feats)
    gains = {}
    for feat, fn in feats.items():
        fvc: dict = {}
        for r in rows:
            fvc.setdefault(fn(r), Counter())[r[3]] += 1
        wg6 = 0
        for cnt in fvc.values():
            nv = sum(cnt.values())
            sq = sum(c * c for c in cnt.values())
            wg6 += _micro((float(nv) * nv - sq) / nv)
        res = got[feat]
        assert res["n_values"] == len(fvc)
        assert res["gini_root"] == _r6(g_root)
        assert res["gini_weighted"] == _r6(wg6 / 1e6 / n)
        gains[feat] = res["gini_gain"]
        assert res["gini_gain"] == _r6(g_root - wg6 / 1e6 / n)
    # output must come back ranked by gain (same collected rows — no
    # second Spark run just to check ordering)
    order = [r["feature"] for r in out]
    assert order == sorted(gains, key=lambda f: (-gains[f], f))


def test_irls_huber_matches_python_reference(spark, con):
    from real_estate_data_pipeline_spark.queries import _HUBER_D6

    rows = con.execute(
        f"""SELECT CAST(l_quantity AS BIGINT),
                   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            FROM '{SF}/lineitem.parquet'"""
    ).fetchall()
    n = len(rows)
    sx = sum(x for x, _ in rows)
    sy = sum(y for _, y in rows)
    sxy = sum(x * y for x, y in rows)
    sxx = sum(x * x for x, _ in rows)
    b6 = _micro(
        (float(n) * sxy - float(sx) * sy) / (float(n) * sxx - float(sx) * sx)
    )
    a6 = _micro((float(sy) - b6 * float(sx) / 1e6) / n)
    a06, b06 = a6, b6

    def _round(a6, b6):
        sw = swx = swy = swxy = swxx = n_dw = 0
        for x, y in rows:
            e6 = abs(y * 1000000 - (a6 + b6 * x))
            if e6 <= _HUBER_D6:
                w6 = 1000000
            else:
                w6 = _micro(float(_HUBER_D6) / e6)
                n_dw += 1
            sw += w6
            swx += w6 * x
            swy += w6 * y
            swxy += w6 * x * y
            swxx += w6 * x * x
        fswy, fswxy, fswxx = float(swy), float(swxy), float(swxx)
        nb6 = _micro(
            (float(sw) * fswxy - float(swx) * fswy)
            / (float(sw) * fswxx - float(swx) * float(swx))
        )
        na6 = _micro((fswy - nb6 * float(swx) / 1e6) / sw * 1e6 / 1e6)
        return na6, nb6, n_dw, sw

    a6, b6, _, _ = _round(a6, b6)
    a6, b6, n_dw, sw = _round(a6, b6)
    [r] = _run(spark, "ml_irls_huber_price_qty")
    assert r["n_rows"] == n
    assert r["a_ols"] == _r6(a06 / 1e6)
    assert r["b_ols"] == _r6(b06 / 1e6)
    assert r["a_huber"] == _r6(a6 / 1e6)
    assert r["b_huber"] == _r6(b6 / 1e6)
    assert (r["n_downweighted"], r["w_mass6"]) == (n_dw, sw)
    assert 0 < n_dw < n  # the delta genuinely splits the population
