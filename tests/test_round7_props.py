"""Independent Python references for the round-7 operators whose DuckDB
oracles are themselves GENERATED or structurally complex (winnowing,
label propagation, Kneser-Ney, truncated EWMA, triangle census). The
parity suite proves Spark == DuckDB; these tests prove both == a third,
hand-rolled implementation — guarding against a same-bug-in-both-sides
failure mode that cross-engine hashing cannot catch.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    con.close()
    return rows


def _run(spark, name, sf=SF):
    from real_estate_data_pipeline_spark.queries import CATALOG

    return CATALOG[name].fn(spark, sf).collect()


def _sha_prefix_int(data: str) -> int:
    return int(hashlib.sha256(data.encode()).hexdigest()[:8], 16)


def test_winnowing_matches_python_reference(spark, docs):
    """Full third implementation of winnowing (k=8 char grams, w=4,
    leftmost-min per window via the hash*2^30+pos encoding) down to the
    top-20 overlap pairs with identical tie-breaks."""
    fps = {}
    for doc_id, text in docs:
        txt = text.strip().lower()
        n = len(txt)
        enc = [
            _sha_prefix_int(txt[i : i + 8]) * 1073741824 + (i + 1)
            for i in range(0, n - 7)
        ]
        sel = set()
        for end in range(3, len(enc)):  # windows of 4 ending at pos>=4
            sel.add(min(enc[end - 3 : end + 1]) // 1073741824)
        if sel:
            fps[doc_id] = sel
    # boilerplate suppression: drop fingerprints present in > 64 docs
    df_count = Counter(h for s in fps.values() for h in s)
    fps = {
        d: {h for h in s if df_count[h] <= 64}
        for d, s in fps.items()
    }
    fps = {d: s for d, s in fps.items() if s}
    pair_shared = Counter()
    ids = sorted(fps)
    inv = defaultdict(list)
    for d, s in fps.items():
        for h in s:
            inv[h].append(d)
    for h, ds in inv.items():
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                pair_shared[(ds[i], ds[j])] += 1
    rows = []
    for (a, b), sh in pair_shared.items():
        if sh >= 2:
            rows.append(
                (a, b, sh, round(sh / (len(fps[a]) + len(fps[b]) - sh), 6))
            )
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    expect = rows[:20]
    got = [
        (r["id_a"], r["id_b"], r["shared_fp"], r["fp_jaccard"])
        for r in _run(spark, "doc_winnowing_fingerprint_overlap")
    ]
    assert got == expect


def test_label_propagation_matches_python_reference(spark):
    """3 synchronous min-label rounds in plain Python over the SAME
    pair set (collected from the registered portable-MinHash op), vs
    the Spark loop's community histogram."""
    from pyspark.sql import functions as F

    from real_estate_data_pipeline_spark.ops import dedup
    from real_estate_data_pipeline_spark.queries import t

    d = t(spark, SF, "documents")
    pairs = [
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_dup_pairs_portable(
            d, "doc_id", "text", num_perm=16, bands=4, jaccard_threshold=0.5
        )
        .select("id_a", "id_b")
        .collect()
    ]
    nbrs = defaultdict(set)
    for a, b in pairs:
        nbrs[a].add(b)
        nbrs[b].add(a)
    lbl = {n: n for n in nbrs}
    for _ in range(3):
        lbl = {
            n: min([lbl[n]] + [lbl[m] for m in nbrs[n]]) for n in nbrs
        }
    hist = Counter(lbl.values())
    expect = sorted(
        ((c, sz) for c, sz in hist.items()), key=lambda x: (-x[1], x[0])
    )[:20]
    got = [
        (r["community"], r["n_members"])
        for r in _run(spark, "graph_label_propagation_communities")
    ]
    assert got == expect


def test_triangle_census_matches_python_reference(spark):
    from real_estate_data_pipeline_spark.ops import dedup
    from real_estate_data_pipeline_spark.queries import t

    d = t(spark, SF, "documents")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_dup_pairs_portable(
            d, "doc_id", "text", num_perm=16, bands=4, jaccard_threshold=0.5
        )
        .select("id_a", "id_b")
        .collect()
    }
    nbrs = defaultdict(set)
    for a, b in pairs:
        nbrs[a].add(b)
        nbrs[b].add(a)
    tri = sum(
        1
        for (a, b) in pairs
        for c in nbrs[a]
        if c > b and (b, c) in pairs
    )
    wedges2 = sum(len(v) * (len(v) - 1) for v in nbrs.values())
    (row,) = _run(spark, "graph_triangle_count")
    assert row["triangles"] == tri
    assert row["wedges"] == wedges2 // 2
    assert row["global_clustering"] == round(6.0 * tri / wedges2, 6)


def test_ewma_matches_recursive_reference(spark):
    """The unrolled 8-tap filter vs a direct Python loop over the same
    hourly cents series (truncated-history EWMA, alpha=0.25)."""
    con = duckdb.connect()
    hourly = con.execute(
        f"""
        SELECT event_type, date_trunc('hour', ts) AS h,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS c
        FROM '{SF}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    con.close()
    series = defaultdict(list)
    for et, h, c in hourly:
        series[et].append(int(c))
    expect = {}
    for et, cs in series.items():
        for i in range(len(cs)):
            num = den = 0.0
            for j in range(8):
                if i - j < 0:
                    break
                w = 0.75**j
                num += cs[i - j] * w
                den += w
            expect[(et, i)] = round((num / den) / 100.0, 6)
    got = _run(spark, "evt_ewma_hourly")
    by_et_idx = defaultdict(int)
    assert len(got) == sum(len(v) for v in series.values())
    for r in got:  # rows arrive ordered by (event_type, h)
        i = by_et_idx[r["event_type"]]
        by_et_idx[r["event_type"]] += 1
        assert r["ewma8"] == pytest.approx(
            expect[(r["event_type"], i)], abs=1.5e-6
        ), (r["event_type"], i)


def test_kneser_ney_matches_python_reference(spark):
    """Interpolated KN (D=0.75) re-derived from scratch in Python over
    the same hash split, compared per held-out doc at 6 dp."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, lower(trim(text)) FROM '{SF}/documents.parquet'"
    ).fetchall()
    con.close()

    def u(doc_id):
        return (
            int(
                hashlib.sha256(f"{doc_id}lm".encode()).hexdigest()[:8], 16
            )
            / 4294967296.0
        )

    train_bg, ev_bg = [], defaultdict(list)
    for doc_id, txt in rows:
        toks = [w for w in txt.split() if w]
        bgs = list(zip(toks, toks[1:]))
        if u(doc_id) < 0.7:
            train_bg.extend(bgs)
        else:
            ev_bg[doc_id] = bgs
    cb = Counter(train_bg)
    cw1 = Counter(w1 for w1, _ in train_bg)
    n1f = defaultdict(set)
    n1b = defaultdict(set)
    for w1, w2 in cb:
        n1f[w1].add(w2)
        n1b[w2].add(w1)
    tt = len(cb)
    expect = {}
    for doc_id, bgs in ev_bg.items():
        terms, oov = [], 0
        for w1, w2 in bgs:
            if (w1, w2) in cb:
                p = ((cb[(w1, w2)] - 0.75) / cw1[w1]) + (
                    (0.75 * len(n1f[w1])) / cw1[w1]
                ) * (len(n1b[w2]) / tt)
            elif w1 in cw1 and w2 in n1b:
                p = ((0.75 * len(n1f[w1])) / cw1[w1]) * (len(n1b[w2]) / tt)
            elif w1 not in cw1 and w2 in n1b:
                p = len(n1b[w2]) / tt
            else:
                oov += 1
                continue
            terms.append(round(round(math.log(p), 6) * 1e6))
        if terms or oov:
            expect[doc_id] = (
                round((sum(terms) / 1e6) / len(terms), 6) if terms else None,
                len(terms),
                oov,
            )
    got = {
        r["doc_id"]: (r["avg_logprob"], r["n_scored"], r["n_oov"])
        for r in _run(spark, "doc_kneser_ney_bigram_logprob")
    }
    assert set(got) == set(expect)
    for doc_id, (alp, n, oov) in expect.items():
        g = got[doc_id]
        assert g[1] == n and g[2] == oov, doc_id
        if alp is None:
            assert g[0] is None, doc_id
        else:
            assert g[0] == pytest.approx(alp, abs=2e-6), doc_id


def test_rfm_partition_is_exhaustive(spark):
    """Every customer with orders lands in exactly one RFM segment and
    the quartile axes each split the population into 4 near-equal
    parts (ntile's defining property)."""
    con = duckdb.connect()
    (n_cust,) = con.execute(
        f"SELECT COUNT(DISTINCT o_custkey) FROM '{SF}/orders.parquet'"
    ).fetchone()
    con.close()
    got = _run(spark, "cust_rfm_segmentation")
    assert sum(r["n_customers"] for r in got) == n_cust
    for axis in range(3):  # R, F, M
        per = Counter()
        for r in got:
            per[r["segment"][1 + 2 * axis]] += r["n_customers"]
        assert set(per) == {"1", "2", "3", "4"}
        assert max(per.values()) - min(per.values()) <= 1
