"""Split from queries.py lines 12650-13435 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, F, Window, dedup, register, t
from .q09_llm_dedup_text_sim import _HASH01_SQL
from .q15_curation_r3 import _minhash_portable_oracle
from .q16_curation_r4 import _assert_rank_mass

# ===========================================================================
# round-7 additions: language-model estimation / corpus statistics
# ===========================================================================

register(
    "doc_good_turing_counts",
    # Good-Turing frequency re-estimation over the unigram counts: the
    # count-of-counts table N_r and the adjusted count r* =
    # (r+1) N_{r+1} / N_r — the smoothing table every LM quality gate
    # starts from. Pure integer counts until the one rounded division;
    # r* is NULL where N_{r+1} is empty (the standard raw-GT gap).
    oracle="""
    WITH w AS (
      SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
      FROM documents
    ),
    c AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS r FROM w WHERE w <> '' GROUP BY w),
    coc AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS n_types FROM c GROUP BY r)
    SELECT cur.r, cur.n_types,
           CAST(cur.r * cur.n_types AS BIGINT) AS token_mass,
           round((cur.r + 1.0) * nxt.n_types / cur.n_types, 6) AS gt_adjusted_count
    FROM coc cur LEFT JOIN coc nxt ON nxt.r = cur.r + 1
    ORDER BY cur.r
    LIMIT 25
    """,
)


def _dgoodturing(spark, sf_dir):
    """Good-Turing count-of-counts: two cascaded aggregates (token ->
    count, count -> type frequency) and a self left-join on r+1. The
    second aggregate's input is the vocabulary, already orders of
    magnitude smaller than the corpus — the classic shrinking-pipeline
    shape that scales to any corpus size."""
    d = t(spark, sf_dir, "documents")
    w = d.select(
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    c = w.groupBy("w").agg(F.count("*").cast("long").alias("r"))
    coc = c.groupBy("r").agg(F.count("*").cast("long").alias("n_types"))
    nxt = coc.select(
        (F.col("r") - 1).alias("r"), F.col("n_types").alias("__next_types")
    )
    return (
        coc.join(nxt, "r", "left")
        .select(
            "r",
            "n_types",
            (F.col("r") * F.col("n_types")).cast("long").alias("token_mass"),
            F.round(
                (F.col("r") + F.lit(1.0)) * F.col("__next_types") / F.col("n_types"),
                6,
            ).alias("gt_adjusted_count"),
        )
        .orderBy("r")
        .limit(25)
    )


CATALOG["doc_good_turing_counts"].fn = _dgoodturing


# Interpolated Kneser-Ney probability, shared expression text: the SAME
# string parses in Spark SQL and DuckDB, so the float operation order is
# identical by construction. Branches are decided by NULL-ness of the
# left-joined count columns (deterministic); __cb >= 1 so the 0.75
# discount never goes negative.
_KN_P_EXPR = (
    "CASE "
    "WHEN __cb IS NOT NULL THEN "
    "((CAST(__cb AS DOUBLE) - 0.75) / __cw1)"
    " + ((0.75 * CAST(__n1f AS DOUBLE)) / __cw1) * (CAST(__n1b AS DOUBLE) / __tt) "
    "WHEN __cw1 IS NOT NULL AND __n1b IS NOT NULL THEN "
    "((0.75 * CAST(__n1f AS DOUBLE)) / __cw1) * (CAST(__n1b AS DOUBLE) / __tt) "
    "WHEN __cw1 IS NULL AND __n1b IS NOT NULL THEN "
    "CAST(__n1b AS DOUBLE) / __tt "
    "ELSE NULL END"
)

register(
    "doc_kneser_ney_bigram_logprob",
    # interpolated Kneser-Ney bigram LM (fixed discount D=0.75) trained
    # on the u<0.7 hash split, scoring held-out docs: P(w2|w1) =
    # max(c-D,0)/c(w1) + D·N1+(w1·)/c(w1) · Pcont(w2), with Pcont from
    # continuation counts over distinct bigram types — the smoothing
    # that beats stupid backoff on rare contexts (vs the registered
    # doc_trigram_backoff_logprob baseline). All counts exact integers;
    # the probability assembly is the shared _KN_P_EXPR text, micro-nat
    # summed per doc (order-independent).
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk,
             {_HASH01_SQL.format(key="doc_id || 'lm'")} AS u
      FROM documents
    ),
    bg AS (
      SELECT doc_id, u, tk[i] AS w1, tk[i + 1] AS w2
      FROM tk, (SELECT unnest(range(1, (SELECT MAX(len(tk)) FROM tk) + 1)) AS i) g
      WHERE i < len(tk) AND tk[i] <> '' AND tk[i + 1] <> ''
    ),
    train AS (SELECT * FROM bg WHERE u < 0.7),
    ev AS (SELECT * FROM bg WHERE u >= 0.7),
    cb AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM train GROUP BY 1, 2),
    cw1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c,
                   CAST(COUNT(DISTINCT w2) AS BIGINT) AS n1f
            FROM train GROUP BY 1),
    n1b AS (SELECT w2, CAST(COUNT(DISTINCT w1) AS BIGINT) AS c FROM train GROUP BY 1),
    tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM cb),
    terms AS (
      SELECT ev.doc_id,
             {_KN_P_EXPR.replace("__cb", "cb.c").replace("__cw1", "cw1.c")
                        .replace("__n1f", "cw1.n1f").replace("__n1b", "n1b.c")
                        .replace("__tt", "tt.c")} AS __p
      FROM ev
      LEFT JOIN cb ON cb.w1 = ev.w1 AND cb.w2 = ev.w2
      LEFT JOIN cw1 ON cw1.w1 = ev.w1
      LEFT JOIN n1b ON n1b.w2 = ev.w2
      CROSS JOIN tt
    )
    SELECT doc_id,
           round((CAST(SUM(CAST(round(round(ln(__p), 6) * 1000000) AS BIGINT))
                       AS DOUBLE) / 1000000.0)
                 / COUNT(CASE WHEN __p IS NOT NULL THEN 1 END), 6) AS avg_logprob,
           CAST(COUNT(CASE WHEN __p IS NOT NULL THEN 1 END) AS BIGINT) AS n_scored,
           CAST(COUNT(CASE WHEN __p IS NULL THEN 1 END) AS BIGINT) AS n_oov
    FROM terms GROUP BY doc_id
    ORDER BY doc_id
    """,
)


def _dkneserney(spark, sf_dir):
    """Interpolated Kneser-Ney bigram scoring of the held-out split —
    the production LM-filter shape: train counts (bigram, context,
    continuation) are three aggregates over the train split, the
    held-out bigrams meet them through equi-joins on the words, and the
    bigram-type total rides as a 1-row broadcast. The probability
    expression is the exact same text the oracle runs (_KN_P_EXPR), so
    cross-engine float drift is structurally impossible."""
    d = t(spark, sf_dir, "documents")
    from ..ops.sampling import hash_uniform01

    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    u = hash_uniform01(F.concat(F.col("doc_id").cast("string"), F.lit("lm")))
    base = d.select("doc_id", F.posexplode(toks).alias("p", "w1"), u.alias("u")).filter(
        F.col("w1") != ""
    )
    wnd = Window.partitionBy("doc_id").orderBy("p")
    bg = (
        base.withColumn("w2", F.lead("w1").over(wnd))
        .filter(F.col("w2").isNotNull())
        .select("doc_id", "u", "w1", "w2")
    )
    train = bg.filter(F.col("u") < 0.7)
    ev = bg.filter(F.col("u") >= 0.7)
    cb = train.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("__cb"))
    cw1 = train.groupBy("w1").agg(
        F.count("*").cast("long").alias("__cw1"),
        F.countDistinct("w2").cast("long").alias("__n1f"),
    )
    n1b = train.groupBy("w2").agg(
        F.countDistinct("w1").cast("long").alias("__n1b")
    )
    tt = cb.agg(F.count("*").cast("long").alias("__tt"))
    terms = (
        ev.join(cb, ["w1", "w2"], "left")
        .join(cw1, "w1", "left")
        .join(n1b, "w2", "left")
        .crossJoin(F.broadcast(tt))
        .select("doc_id", F.expr(_KN_P_EXPR).alias("__p"))
    )
    scored = F.count(F.when(F.col("__p").isNotNull(), 1))
    return (
        terms.groupBy("doc_id")
        .agg(
            F.round(
                (
                    F.sum(
                        F.round(F.round(F.expr("ln(__p)"), 6) * 1000000, 0).cast(
                            "long"
                        )
                    ).cast("double")
                    / 1000000.0
                )
                / scored,
                6,
            ).alias("avg_logprob"),
            scored.cast("long").alias("n_scored"),
            F.count(F.when(F.col("__p").isNull(), 1)).cast("long").alias("n_oov"),
        )
        .orderBy("doc_id")
    )


CATALOG["doc_kneser_ney_bigram_logprob"].fn = _dkneserney

register(
    "doc_ngram_novelty_curve",
    # per-document novelty in ingestion (doc_id) order: the fraction of
    # a doc's distinct word-3-grams never seen in any earlier document
    # (first-seen = MIN(doc_id) per gram — one aggregate, no running
    # state). The curve that tells a curator when a source stops
    # contributing new content. Exact integers + one rounded division.
    oracle="""
    WITH tk AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
      FROM documents
    ),
    g AS (
      SELECT DISTINCT doc_id,
             tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2] AS gram
      FROM tk, (SELECT unnest(range(1, (SELECT MAX(len(tk)) FROM tk) + 1)) AS i) gr
      WHERE i + 1 < len(tk) AND tk[i] <> '' AND tk[i + 1] <> '' AND tk[i + 2] <> ''
    ),
    firsts AS (SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY gram)
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(COUNT(CASE WHEN f.first_doc = g.doc_id THEN 1 END) AS BIGINT)
             AS n_novel,
           round(CAST(COUNT(CASE WHEN f.first_doc = g.doc_id THEN 1 END) AS DOUBLE)
                 / COUNT(*), 6) AS novelty
    FROM g JOIN firsts f ON f.gram = g.gram
    GROUP BY g.doc_id
    ORDER BY g.doc_id
    """,
)


def _dnovelty(spark, sf_dir):
    """3-gram novelty curve: MIN(doc_id) per gram replaces any running
    dedup state (the same trick dedup_incremental uses), one equi-join
    back, one per-doc rollup. At 100 TB the gram->first-seen table IS
    the incremental-ingest index — computing it is a single shuffle on
    the gram key."""
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    base = d.select("doc_id", F.posexplode(toks).alias("p", "w")).filter(
        F.col("w") != ""
    )
    wnd = Window.partitionBy("doc_id").orderBy("p")
    g = (
        base.withColumn("w2", F.lead("w", 1).over(wnd))
        .withColumn("w3", F.lead("w", 2).over(wnd))
        .filter(F.col("w2").isNotNull() & F.col("w3").isNotNull())
        .select("doc_id", F.concat_ws(" ", "w", "w2", "w3").alias("gram"))
        .distinct()
    )
    firsts = g.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    novel = F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1))
    return (
        g.join(firsts, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            novel.cast("long").alias("n_novel"),
            F.round(novel.cast("double") / F.count("*"), 6).alias("novelty"),
        )
        .orderBy("doc_id")
    )


CATALOG["doc_ngram_novelty_curve"].fn = _dnovelty

register(
    "doc_heaps_law_fit",
    # Heaps' law V(N) = K·N^beta fitted over the cumulative
    # (tokens, vocabulary) curve in doc_id order: new-type credit via
    # MIN(doc_id) per type, cumulative sums over the per-doc aggregate,
    # log points quantized to 6-dp micro-units so the OLS moment sums
    # are exact integers; beta and K assemble from those exact sums in
    # one identical expression. The sizing law for vocab/embedding
    # tables before a full-corpus pass.
    oracle="""
    WITH w AS (
      SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
      FROM documents
    ),
    tok AS (SELECT doc_id, w FROM w WHERE w <> ''),
    per_doc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok
                FROM tok GROUP BY doc_id),
    firsts AS (SELECT w, MIN(doc_id) AS first_doc FROM tok GROUP BY w),
    new_types AS (SELECT first_doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_new
                  FROM firsts GROUP BY first_doc),
    curve AS (
      SELECT p.doc_id,
             SUM(p.n_tok) OVER (ORDER BY p.doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum_tok,
             SUM(COALESCE(nt.n_new, 0)) OVER (ORDER BY p.doc_id
                                              ROWS UNBOUNDED PRECEDING) AS cum_vocab
      FROM per_doc p LEFT JOIN new_types nt ON nt.doc_id = p.doc_id
    ),
    pts AS (
      SELECT CAST(round(round(ln(CAST(cum_tok AS DOUBLE)), 6) * 1000000) AS BIGINT) AS x,
             CAST(round(round(ln(CAST(cum_vocab AS DOUBLE)), 6) * 1000000) AS BIGINT) AS y
      FROM curve
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM pts
    )
    SELECT n AS n_points,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS heaps_beta,
           round(exp((CAST(sy AS DOUBLE) / 1000000.0
                      - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                        * (CAST(sx AS DOUBLE) / 1000000.0)) / CAST(n AS DOUBLE)),
                 6) AS heaps_k
    FROM m
    """,
)


def _dheaps(spark, sf_dir):
    """Heaps'-law fit: the vocabulary-growth exponent from a log-log
    OLS over the cumulative curve. The running sums are a global window
    over the PER-DOC aggregate (corpus-cardinality rows, agg-bounded);
    the OLS consumes exact micro-unit integer moments, so the fit is
    bit-stable on any engine."""
    d = t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    per_doc = tok.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_tok"))
    firsts = tok.groupBy("w").agg(F.min("doc_id").alias("first_doc"))
    new_types = firsts.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count("*").cast("long").alias("n_new")
    )
    wnd = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    curve = (
        per_doc.join(new_types, "doc_id", "left")
        .select(
            "doc_id",
            F.sum("n_tok").over(wnd).alias("cum_tok"),
            F.sum(F.coalesce(F.col("n_new"), F.lit(0))).over(wnd).alias("cum_vocab"),
        )
    )
    micro = lambda c: F.round(  # noqa: E731
        F.round(F.log(c.cast("double")), 6) * 1000000, 0
    ).cast("long")
    pts = curve.select(
        micro(F.col("cum_tok")).alias("x"), micro(F.col("cum_vocab")).alias("y")
    )
    m = pts.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    n, sx, sy, sxy, sxx = [
        F.col(c).cast("double") for c in ("n", "sx", "sy", "sxy", "sxx")
    ]
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        F.col("n").alias("n_points"),
        F.round(beta, 6).alias("heaps_beta"),
        F.round(
            F.exp((sy / 1000000.0 - beta * (sx / 1000000.0)) / n), 6
        ).alias("heaps_k"),
    )


CATALOG["doc_heaps_law_fit"].fn = _dheaps


def _textrank_oracle(
    rounds: int = 3, damping: float = 0.85, teleport: float = 0.15
) -> str:
    """Unrolled weighted PageRank over the word co-occurrence graph
    (TextRank, Mihalcea & Tarau 2004): adjacent content-word pairs
    (len >= 4) as undirected weighted edges, contributions
    pr·w/wdeg rounded to 6 dp then micro-unit summed per round —
    the graph_pagerank_dup_nodes exactness recipe on a word graph."""
    _assert_rank_mass(damping, teleport)
    prev = "r0"
    iters = []
    for r in range(1, rounds + 1):
        iters.append(f""",
    c{r} AS (
      SELECT e.dst AS word,
             SUM(CAST(floor(round(p.pr * e.w / d.wdeg, 6) * 1000000 + 0.5)
                      AS BIGINT)) AS s
      FROM edges e
      JOIN {prev} p ON e.src = p.word
      JOIN wdeg d ON e.src = d.word
      GROUP BY e.dst
    ),
    r{r} AS (
      SELECT n.word,
             round({teleport!r} + {damping!r} *
                   (CAST(COALESCE(c{r}.s, 0) AS DOUBLE) / 1000000.0), 6) AS pr
      FROM nodes n LEFT JOIN c{r} ON n.word = c{r}.word
    )""")
        prev = f"r{r}"
    return f"""
    WITH tk AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
      FROM documents
    ),
    adj AS (
      SELECT tk[i] AS w1, tk[i + 1] AS w2
      FROM tk, (SELECT unnest(range(1, (SELECT MAX(len(tk)) FROM tk) + 1)) AS i) g
      WHERE i < len(tk) AND len(tk[i]) >= 4 AND len(tk[i + 1]) >= 4
    ),
    und AS (
      SELECT least(w1, w2) AS a, greatest(w1, w2) AS b, COUNT(*) AS w
      FROM adj WHERE w1 <> w2 GROUP BY 1, 2
    ),
    edges AS (
      SELECT a AS src, b AS dst, CAST(w AS BIGINT) AS w FROM und
      UNION ALL
      SELECT b, a, CAST(w AS BIGINT) FROM und
    ),
    nodes AS (SELECT DISTINCT src AS word FROM edges),
    wdeg AS (SELECT src AS word, CAST(SUM(w) AS BIGINT) AS wdeg
             FROM edges GROUP BY src),
    r0 AS (SELECT word, 1.0 AS pr FROM nodes){"".join(iters)}
    SELECT word, pr AS textrank
    FROM {prev}
    ORDER BY textrank DESC, word
    LIMIT 20
    """


register("doc_textrank_keywords", oracle=_textrank_oracle())


def _dtextrank(spark, sf_dir):
    """TextRank keyword extraction: weighted PageRank (3 unrolled
    rounds) over the corpus-wide word co-occurrence graph — adjacent
    content words (len >= 4), co-occurrence counts as weights. The
    word graph is a vocabulary-sized artifact (not corpus-sized), each
    round one equi-join + aggregate, each round's rank frame
    localCheckpoint'ed per the iterative convention. Composes the
    graph_pagerank_dup_nodes machinery on a different graph."""
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    base = d.select("doc_id", F.posexplode(toks).alias("p", "w1"))
    wnd = Window.partitionBy("doc_id").orderBy("p")
    adj = (
        base.withColumn("w2", F.lead("w1").over(wnd))
        .filter(
            (F.length("w1") >= 4)
            & (F.length("w2") >= 4)
            & (F.col("w1") != F.col("w2"))
        )
        .select(
            F.least("w1", "w2").alias("a"), F.greatest("w1", "w2").alias("b")
        )
    )
    und = adj.groupBy("a", "b").agg(F.count("*").cast("long").alias("w"))
    edges = (
        und.select(F.col("a").alias("src"), F.col("b").alias("dst"), "w")
        .unionByName(
            und.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w")
        )
        .persist()
    )
    try:
        nodes = edges.select(F.col("src").alias("word")).distinct()
        wdeg = edges.groupBy(F.col("src").alias("word")).agg(
            F.sum("w").cast("long").alias("wdeg")
        )
        pr = nodes.select("word", F.lit(1.0).alias("pr"))
        for _ in range(3):
            contrib = (
                edges.join(
                    pr.withColumnsRenamed({"word": "src"}), "src"
                )
                .join(
                    wdeg.withColumnsRenamed({"word": "src", "wdeg": "__wd"}),
                    "src",
                )
                .select(
                    F.col("dst").alias("word"),
                    F.floor(
                        F.round(F.col("pr") * F.col("w") / F.col("__wd"), 6)
                        * 1e6
                        + F.lit(0.5)
                    )
                    .cast("long")
                    .alias("__c"),
                )
                .groupBy("word")
                .agg(F.sum("__c").alias("__s"))
            )
            pr = (
                nodes.join(contrib, "word", "left")
                .select(
                    "word",
                    F.round(
                        F.lit(0.15)
                        + F.lit(0.85)
                        * (
                            F.coalesce(F.col("__s"), F.lit(0)).cast("double")
                            / F.lit(1e6)
                        ),
                        6,
                    ).alias("pr"),
                )
                .localCheckpoint(eager=True)
            )
        return (
            pr.select("word", F.col("pr").alias("textrank"))
            .orderBy(F.desc("textrank"), "word")
            .limit(20)
        )
    finally:
        edges.unpersist()


CATALOG["doc_textrank_keywords"].fn = _dtextrank

register(
    "doc_idf_weighted_jaccard_pairs",
    # IDF-weighted token-set Jaccard on the MinHash candidate pairs:
    # rare-token overlap counts more than stopword overlap, separating
    # genuine near-dups from boilerplate-heavy false positives. Weights
    # are 6-dp-rounded ln(N/df) scaled to micro-unit BIGINTs, so both
    # the intersection and union masses are exact integer sums.
    oracle=f"""
    WITH pairs AS ({_minhash_portable_oracle()}),
    tok AS (
      SELECT DISTINCT doc_id,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
      FROM documents
    ),
    tokc AS (SELECT doc_id, w FROM tok WHERE w <> ''),
    n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM tokc),
    idf AS (
      SELECT w,
             CAST(round(round(ln(CAST(n.n AS DOUBLE) / COUNT(DISTINCT doc_id)), 6)
                        * 1000000) AS BIGINT) AS iw
      FROM tokc, n GROUP BY w, n.n
    ),
    ta AS (SELECT p.id_a, p.id_b, t.w, i.iw
           FROM pairs p JOIN tokc t ON t.doc_id = p.id_a JOIN idf i ON i.w = t.w),
    tb AS (SELECT p.id_a, p.id_b, t.w, i.iw
           FROM pairs p JOIN tokc t ON t.doc_id = p.id_b JOIN idf i ON i.w = t.w),
    inter AS (
      SELECT ta.id_a, ta.id_b, CAST(COUNT(*) AS BIGINT) AS shared_n,
             CAST(SUM(ta.iw) AS BIGINT) AS shared_mass
      FROM ta JOIN tb ON tb.id_a = ta.id_a AND tb.id_b = ta.id_b AND tb.w = ta.w
      GROUP BY ta.id_a, ta.id_b
    ),
    uni AS (
      SELECT id_a, id_b, CAST(COUNT(*) AS BIGINT) AS union_n,
             CAST(SUM(iw) AS BIGINT) AS union_mass
      FROM (SELECT * FROM ta UNION SELECT * FROM tb)
      GROUP BY id_a, id_b
    )
    SELECT u.id_a, u.id_b,
           CAST(COALESCE(i.shared_n, 0) AS BIGINT) AS shared_tokens,
           round(CAST(COALESCE(i.shared_n, 0) AS DOUBLE) / u.union_n, 6)
             AS plain_jaccard,
           round(CAST(COALESCE(i.shared_mass, 0) AS DOUBLE) / u.union_mass, 6)
             AS idf_jaccard
    FROM uni u LEFT JOIN inter i ON i.id_a = u.id_a AND i.id_b = u.id_b
    ORDER BY idf_jaccard DESC, u.id_a, u.id_b
    LIMIT 20
    """,
)


def _didfjaccard(spark, sf_dir):
    """IDF-weighted verification of MinHash candidates: the candidate
    pair set (banded equi-join output) is re-scored by weighted token
    overlap — at 100 TB this is the verify stage of the two-stage
    near-dup pipeline, touching only candidate docs' token sets, with
    the IDF table a vocabulary-sized build side."""
    d = t(spark, sf_dir, "documents")
    pairs = dedup.minhash_dup_pairs_portable(
        d, "doc_id", "text", num_perm=16, bands=4, jaccard_threshold=0.5
    ).select("id_a", "id_b")
    tokc = (
        d.select(
            "doc_id",
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w"),
        )
        .filter(F.col("w") != "")
        .distinct()
    )
    n = tokc.agg(F.countDistinct("doc_id").cast("long").alias("__n"))
    idf = (
        tokc.groupBy("w")
        .agg(F.countDistinct("doc_id").alias("__df"))
        .crossJoin(F.broadcast(n))
        .select(
            "w",
            F.round(
                F.round(F.log(F.col("__n").cast("double") / F.col("__df")), 6)
                * 1000000,
                0,
            )
            .cast("long")
            .alias("iw"),
        )
    )
    tw = tokc.join(idf, "w")
    ta = pairs.join(tw.withColumnsRenamed({"doc_id": "id_a"}), "id_a").select(
        "id_a", "id_b", "w", "iw"
    )
    tb = pairs.join(tw.withColumnsRenamed({"doc_id": "id_b"}), "id_b").select(
        "id_a", "id_b", "w", "iw"
    )
    inter = ta.join(tb, ["id_a", "id_b", "w"]).groupBy("id_a", "id_b").agg(
        F.count("*").cast("long").alias("shared_n"),
        F.sum(ta["iw"]).cast("long").alias("shared_mass"),
    )
    uni = (
        ta.unionByName(tb)
        .distinct()
        .groupBy("id_a", "id_b")
        .agg(
            F.count("*").cast("long").alias("union_n"),
            F.sum("iw").cast("long").alias("union_mass"),
        )
    )
    shared_n = F.coalesce(F.col("shared_n"), F.lit(0))
    return (
        uni.join(inter, ["id_a", "id_b"], "left")
        .select(
            "id_a",
            "id_b",
            shared_n.cast("long").alias("shared_tokens"),
            F.round(shared_n.cast("double") / F.col("union_n"), 6).alias(
                "plain_jaccard"
            ),
            F.round(
                F.coalesce(F.col("shared_mass"), F.lit(0)).cast("double")
                / F.col("union_mass"),
                6,
            ).alias("idf_jaccard"),
        )
        .orderBy(F.desc("idf_jaccard"), "id_a", "id_b")
        .limit(20)
    )


CATALOG["doc_idf_weighted_jaccard_pairs"].fn = _didfjaccard

register(
    "doc_winnowing_fingerprint_overlap",
    # winnowing document fingerprints (Schleimer et al. 2003, the MOSS
    # algorithm): 8-char-gram hashes, window w=4, each window selects
    # its minimum (ties to the LEFTMOST position via the hash*2^30+pos
    # encoding (32-bit hash + 30-bit position = 62 bits, so documents
    # up to ~1e9 chars keep exact fingerprints) — deterministic on both engines); docs sharing >= 2
    # selected fingerprints are plagiarism-style overlap candidates.
    # The gram hash is the portable sha256-prefix integer. Fingerprints
    # present in more than 64 documents are dropped before pairing —
    # MOSS's own boilerplate suppression, and the hot-key cap that
    # keeps the fingerprint equi-join's fan-out bounded on
    # duplicate-heavy corpora (a ubiquitous substring would otherwise
    # pair every document with every other).
    oracle="""
    WITH ch AS (
      SELECT doc_id, lower(trim(text)) AS txt FROM documents
    ),
    pos AS (
      SELECT doc_id, i,
             ('0x' || substr(sha256(substr(txt, i, 8)), 1, 8))::UBIGINT
               * 1073741824 + i AS enc
      FROM ch, (SELECT unnest(range(1, (SELECT MAX(len(txt)) FROM ch) + 1)) AS i) g
      WHERE i <= len(txt) - 7
    ),
    sel0 AS (
      SELECT DISTINCT doc_id,
             CAST(MIN(enc) OVER (PARTITION BY doc_id ORDER BY i
                                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                  // 1073741824 AS BIGINT) AS fp
      FROM pos QUALIFY i >= 4
    ),
    dfc AS (SELECT fp FROM sel0 GROUP BY fp HAVING COUNT(*) <= 64),
    sel AS (SELECT sel0.doc_id, sel0.fp FROM sel0 JOIN dfc ON dfc.fp = sel0.fp),
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp
              FROM sel GROUP BY doc_id),
    ov AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(COUNT(*) AS BIGINT) AS shared_fp
      FROM sel a JOIN sel b ON b.fp = a.fp AND b.doc_id > a.doc_id
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
    SELECT ov.id_a, ov.id_b, ov.shared_fp,
           round(CAST(ov.shared_fp AS DOUBLE)
                 / (sa.n_fp + sb.n_fp - ov.shared_fp), 6) AS fp_jaccard
    FROM ov
    JOIN sizes sa ON sa.doc_id = ov.id_a
    JOIN sizes sb ON sb.doc_id = ov.id_b
    ORDER BY ov.shared_fp DESC, ov.id_a, ov.id_b
    LIMIT 20
    """,
)


def _dwinnowing(spark, sf_dir):
    """Winnowing fingerprint overlap: the guaranteed-detection
    fingerprinting MinHash lacks (any shared substring >= k+w-1 chars
    IS caught). Char-gram hashes ride one partitioned rows-frame
    window; the min-selection encodes (hash, pos) into one BIGINT so
    the leftmost-minimum tie-break is a plain MIN; candidate pairs
    come from the fingerprint equi-join — never a doc x doc product —
    and fingerprints in > 64 docs are dropped first (MOSS's
    boilerplate suppression doubling as the hot-key cap: without it a
    ubiquitous substring pairs everything with everything, the OOM the
    10x duplicate-heavy probe actually hit). At 100 TB the sha256 gram
    hash swaps for xxhash64 (same plan, non-portable hash) exactly
    like the MinHash fast path."""
    d = t(spark, sf_dir, "documents")
    ch = d.select("doc_id", F.lower(F.trim("text")).alias("txt"))
    pos = (
        ch.select(
            "doc_id",
            "txt",
            F.explode(F.sequence(F.lit(1), F.length("txt") - 7)).alias("i"),
        )
        .filter(F.length("txt") >= 8)
        .select(
            "doc_id",
            "i",
            (
                F.conv(
                    F.substring(
                        F.sha2(F.col("txt").substr(F.col("i"), F.lit(8)), 256),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint")
                * 1073741824
                + F.col("i")
            ).alias("enc"),
        )
    )
    wnd = Window.partitionBy("doc_id").orderBy("i").rowsBetween(-3, 0)
    sel0 = (
        pos.withColumn("__m", F.min("enc").over(wnd))
        .filter(F.col("i") >= 4)
        .select("doc_id", (F.col("__m") / 1073741824).cast("long").alias("fp"))
        .distinct()
    )
    dfc = sel0.groupBy("fp").agg(F.count("*").alias("__df")).filter(
        F.col("__df") <= 64
    )
    sel = sel0.join(dfc.select("fp"), "fp")
    sizes = sel.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_fp"))
    a = sel.withColumnsRenamed({"doc_id": "id_a"})
    b = sel.withColumnsRenamed({"doc_id": "id_b"})
    ov = (
        a.join(b, "fp")
        .filter(F.col("id_b") > F.col("id_a"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("shared_fp"))
        .filter(F.col("shared_fp") >= 2)
    )
    sa = sizes.withColumnsRenamed({"doc_id": "id_a", "n_fp": "__na"})
    sb = sizes.withColumnsRenamed({"doc_id": "id_b", "n_fp": "__nb"})
    return (
        ov.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "shared_fp",
            F.round(
                F.col("shared_fp").cast("double")
                / (F.col("__na") + F.col("__nb") - F.col("shared_fp")),
                6,
            ).alias("fp_jaccard"),
        )
        .orderBy(F.desc("shared_fp"), "id_a", "id_b")
        .limit(20)
    )


CATALOG["doc_winnowing_fingerprint_overlap"].fn = _dwinnowing


