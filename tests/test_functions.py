"""Unit tests for the scalar op library on tiny inline DataFrames —
the null/empty/unicode edge cases from SURVEY §5.2.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_estate_data_pipeline_spark.ops import functions as X
from real_estate_data_pipeline_spark.ops import text
from real_estate_data_pipeline_spark.ops.dedup import exact_dedup, keep_latest
from real_estate_data_pipeline_spark.quality.checks import QualityChecker


def col_vals(spark, data, schema, expr):
    df = spark.createDataFrame(data, schema)
    return [r["out"] for r in df.select(expr.alias("out")).collect()]


def test_normalize_phone(spark):
    vals = col_vals(
        spark,
        [("090-123-4567",), ("+84 901234567",), ("junk",), (None,)],
        "x string",
        X.normalize_phone(F.col("x")),
    )
    assert vals[0] == "0901234567"
    assert vals[1] == ""  # 84... doesn't match 0\d{9,10} after stripping '+'
    assert vals[2] == ""


def test_normalize_email(spark):
    vals = col_vals(
        spark,
        [("MAIL@Example.COM ",), ("bad@@x",), (None,)],
        "x string",
        X.normalize_email(F.col("x")),
    )
    assert vals[0] == "mail@example.com"
    assert vals[1] == ""


def test_strip_html_vietnamese(spark):
    vals = col_vals(
        spark,
        [("<b>C&#259;n h&#7897;</b> cao c&aacute;p &amp; <br/> gym",)],
        "x string",
        X.strip_html(F.col("x")),
    )
    assert "<" not in vals[0] and "&amp;" not in vals[0]
    assert "cao cáp" in vals[0] or "cao c" in vals[0]  # entity decoded
    assert "  " not in vals[0]  # whitespace collapsed


def test_strip_html_full_entity_table(spark):
    """Round-trips for the reference's full ~38-entity table
    (transformation_utils.py:91-138), incl. its nonstandard names
    (&ecirc; &etilde; &utilde; &ygrave;) and uppercase variants."""
    cases = [
        ("nh&agrave; &ocirc;t&ocirc;", "nhà ôtô"),
        ("chung c&ecirc; &Ecirc;", "chung cê Ê"),
        ("v&itilde; m&otilde;", "vĩ mõ"),
        ("&Uacute;t &ugrave;n &utilde;", "Út ùn ũ"),
        ("m&yacute; &ygrave;", "mý ỳ"),
        ("&Aacute;&Agrave;&Eacute;&Egrave;&Iacute;&Igrave;", "ÁÀÉÈÍÌ"),
        ("&Oacute;&Ograve;&Uacute;&Ugrave;&Acirc;&Ocirc;", "ÓÒÚÙÂÔ"),
        ("a &atilde; &acirc; &egrave; &igrave; &ograve; &otilde;", "a ã â è ì ò õ"),
    ]
    vals = col_vals(
        spark, [(c[0],) for c in cases], "x string", X.strip_html(F.col("x"))
    )
    for got, (_, want) in zip(vals, cases):
        assert got == want


def test_extract_numeric_and_vnd(spark):
    # F5 keeps every digit and dot ("m2" contributes its 2 — reference parity)
    assert col_vals(spark, [("abc12.5m2",)], "x string", X.extract_numeric(F.col("x")))[0] == 12.52
    assert col_vals(spark, [("~ 99 usd",)], "x string", X.extract_numeric(F.col("x")))[0] == 99.0
    vals = col_vals(
        spark,
        [("5.5 tỷ",), ("300 triệu",), ("1500",)],
        "x string",
        X.parse_vnd_price(F.col("x")),
    )
    assert vals[0] == pytest.approx(5.5e9)
    assert vals[1] == pytest.approx(3e8)
    assert vals[2] == pytest.approx(1500.0)


def test_recode_city(spark):
    vals = col_vals(
        spark,
        [("Hồ Chí Minh",), ("TPHCM",), ("Sài Gòn",), ("Nowhere",)],
        "x string",
        X.recode_map(F.col("x"), X.VN_CITY_MAP),
    )
    assert vals[:3] == ["Ho Chi Minh"] * 3
    assert vals[3] == "Nowhere"


def test_split_geo_malformed(spark):
    df = spark.createDataFrame([("10.5,106.7",), ("nocomma",), (None,)], "x string")
    lat, lng = X.split_geo(F.col("x"))
    rows = df.select(lat.alias("lat"), lng.alias("lng")).collect()
    assert rows[0]["lat"] == pytest.approx(10.5)
    assert rows[1]["lat"] is None and rows[2]["lat"] is None


def test_parse_date_dual(spark):
    df = spark.createDataFrame([("1648771200000",), ("2022-04-01",)], "x string")
    rows = df.select(X.parse_date_dual(F.col("x")).alias("out")).collect()
    assert rows[0]["out"] is not None and rows[0]["out"].year == 2022
    assert rows[1]["out"] is not None and rows[1]["out"].month == 4


def test_bucketize_edges(spark):
    vals = col_vals(
        spark,
        [(-5.0,), (0.0,), (2999.99,), (3000.0,), (9000.0,)],
        "x double",
        X.bucketize(F.col("x"), [0.0, 3000.0, 7000.0], ["neg", "low", "mid", "high"]),
    )
    assert vals == ["neg", "low", "low", "mid", "high"]


def test_completeness_score_bounds(spark):
    df = spark.createDataFrame([("a", None), (None, None)], "x string, y string")
    score = X.completeness_score([F.col("x"), F.col("y")])
    vals = [r["out"] for r in df.select(score.alias("out")).collect()]
    assert vals == [0.5, 0.0]


def test_coerce_string_array(spark):
    df = spark.createDataFrame([('["a","b"]',), ("bare",)], "x string")
    rows = df.select(X.coerce_string_array(F.col("x")).alias("out")).collect()
    assert rows[0]["out"] == ["a", "b"]
    assert rows[1]["out"] == ["bare"]


def test_keep_latest_tiebreak(spark):
    df = spark.createDataFrame(
        [("k", 1, "2024-01-01"), ("k", 2, "2024-01-01")],  # exact ts tie
        "key string, id int, ts string",
    )
    out = keep_latest(df, ["key"], "ts", tiebreakers=["id"]).collect()
    assert len(out) == 1 and out[0]["id"] == 2  # deterministic under ties


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "other")], "id long, txt string"
    )
    out = {r["id"]: r["dup_count"] for r in exact_dedup(df, ["txt"], "id").collect()}
    assert out == {1: 2, 3: 1}


def test_quality_checker_single_pass(spark):
    df = spark.createDataFrame(
        [(1, None, 5.0), (2, "x", 500.0), (2, "y", -3.0)],
        "id int, name string, v double",
    )
    qc = (
        QualityChecker()
        .null_check("name", max_null_pct=0.0)
        .uniqueness_check("id")
        .range_check("v", 0, 100)
        .completeness_check(["id", "name"], 100.0)
    )
    results = {r.name: r for r in qc.run(df)}
    assert not results["null:name"].passed
    assert not results["unique:id"].passed
    assert results["range:v"].metric == pytest.approx(100 * 2 / 3)
    assert not results["completeness"].passed


def test_lang_id_und(spark):
    df = spark.createDataFrame([("xyzzy qwerty",), ("the cat and the hat is a test",)], "x string")
    vals = [r["out"] for r in df.select(text.lang_id(F.col("x")).alias("out")).collect()]
    assert vals[0] == "und" and vals[1] == "en"


def test_stable_bucket_deterministic(spark):
    df = spark.createDataFrame([("abc",), ("abc",), ("def",)], "x string")
    vals = [r["out"] for r in df.select(X.stable_bucket(F.col("x"), 100).alias("out")).collect()]
    assert vals[0] == vals[1]
    assert 0 <= vals[0] < 100 and 0 <= vals[2] < 100


def test_redact_pii_all_classes(spark):
    from real_estate_data_pipeline_spark.ops.text import redact_pii
    from pyspark.sql import functions as F

    cases = [
        (1, "contact me at john.doe+spam@example.co.uk today"),
        (2, "visit https://example.com/a?b=c#frag for info"),
        (3, "server at 192.168.0.1 responded"),
        (4, "call +84 912 345 678 or 0901-234-567 now"),
        (5, "no pii here at all"),
        (6, "mail me via https://site.io/contact?email=a@b.com please"),
    ]
    df = spark.createDataFrame(cases, "id long, text string")
    got = {r["id"]: r["red"] for r in df.select("id", redact_pii(F.col("text")).alias("red")).collect()}
    assert got[1] == "contact me at <EMAIL> today"
    assert got[2] == "visit <URL> for info"
    assert got[3] == "server at <IP> responded"
    assert got[4] == "call <PHONE> or <PHONE> now"
    assert got[5] == "no pii here at all"
    assert got[6] == "mail me via <URL> please"  # email inside URL -> one URL token


def test_repetition_stats_flags_boilerplate(spark):
    from real_estate_data_pipeline_spark.ops.text import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "buy now " * 20),                    # one bigram dominates
            (2, "the quick brown fox jumps high"),   # all distinct
            (3, "x"),                                # single token: excluded
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert 3 not in got
    assert got[1]["top_bigram_frac"] > 0.45   # "now buy"/"buy now" dominate
    assert got[1]["distinct_token_frac"] < 0.1
    assert got[2]["top_bigram_frac"] <= 0.25
    assert got[2]["distinct_token_frac"] == 1.0
