"""Multi-format reader round-trips: csv/orc/json/parquet through
read_any, with schema enforcement and corrupt-record capture."""

from __future__ import annotations

from pyspark.sql import types as T

from real_estate_data_pipeline_spark.io.readers import read_any

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def _src(spark):
    return spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.5)], SCHEMA)


def test_roundtrip_all_formats(spark, tmp_path):
    df = _src(spark)
    for fmt in ("parquet", "orc", "json", "csv"):
        p = str(tmp_path / fmt)
        w = df.write.mode("overwrite")
        if fmt == "csv":
            w = w.option("header", "true")
        w.format(fmt).save(p)
        back = read_any(spark, p, fmt, schema=SCHEMA)
        rows = sorted((r["id"], r["name"], r["score"]) for r in back.select("id", "name", "score").collect())
        assert rows == [(1, "a", 1.5), (2, "b", 2.5)], fmt


def test_write_any_roundtrip(spark, tmp_path):
    from real_estate_data_pipeline_spark.io.writers import write_any

    df = _src(spark)
    for fmt in ("parquet", "orc", "json", "csv"):
        p = str(tmp_path / f"w_{fmt}")
        write_any(df, p, fmt, mode="overwrite")
        back = read_any(spark, p, fmt, schema=SCHEMA)
        rows = sorted((r["id"], r["name"], r["score"]) for r in back.collect())
        assert rows == [(1, "a", 1.5), (2, "b", 2.5)], fmt


def test_dynamic_partition_overwrite_keeps_siblings(spark, tmp_path):
    """S5: overwriting one partition must NOT clobber the others (static
    overwrite mode would truncate the whole table first)."""
    from real_estate_data_pipeline_spark.io.writers import write_parquet

    p = str(tmp_path / "t")
    full = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-02")], "id long, day string"
    )
    write_parquet(full, p, mode="overwrite", partition_by=["day"])
    patch = spark.createDataFrame([(99, "2024-01-02")], "id long, day string")
    write_parquet(patch, p, mode="overwrite", partition_by=["day"])
    rows = sorted((r["id"], str(r["day"])) for r in spark.read.parquet(p).collect())
    assert rows == [(1, "2024-01-01"), (99, "2024-01-02")]  # day-01 survived


def test_csv_corrupt_record(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "x.csv").write_text("id,name,score\n1,a,1.5\nnot-a-long,b,xyz\n")
    back = read_any(spark, str(p), "csv", schema=SCHEMA)
    rows = back.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(good) == 1 and good[0]["id"] == 1
    assert len(bad) == 1 and "not-a-long" in bad[0]["_corrupt_record"]


def test_python_datasource_partitioned_scan(spark):
    """The custom Python DataSource plans one task per InputPartition,
    covers the id range exactly once, and its rows match the shared
    synth_row derivation (the same function the oracle mirrors in SQL)."""
    from real_estate_data_pipeline_spark.io import pysource

    pysource.register(spark)
    df = (
        spark.read.format("synthetic_corpus")
        .option("n_docs", "100")
        .option("n_partitions", "5")
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    rows = {r["doc_id"]: (r["lang"], r["n_chars"]) for r in df.collect()}
    assert sorted(rows) == list(range(100))
    for i in (0, 1, 57, 99):
        _, lang, n_chars = pysource.synth_row(i)
        assert rows[i] == (lang, n_chars)


def test_python_datasource_filter_pushdown(spark):
    """doc_id range predicates push INTO the connector: the reader narrows
    its generated range (reader-level check) and the end-to-end filtered
    scan returns exactly the surviving rows."""
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    from real_estate_data_pipeline_spark.io.pysource import (
        SyntheticCorpusPushdownReader,
        register,
    )

    r = SyntheticCorpusPushdownReader({"n_docs": "2000", "n_partitions": "4"})
    leftover = r.pushFilters(
        [GreaterThanOrEqual(("doc_id",), 1500), LessThan(("doc_id",), 1900)]
    )
    assert list(leftover) == []
    parts = r.partitions()
    assert parts[0].start == 1500 and parts[-1].end == 1900
    assert sum(p.end - p.start for p in parts) == 400

    register(spark)
    df = (
        spark.read.format("synthetic_corpus")
        .option("n_docs", "2000")
        .option("pushdown", "true")
        .load()
        .filter("doc_id >= 1500 AND doc_id < 1900")
    )
    got = sorted(r["doc_id"] for r in df.collect())
    assert got == list(range(1500, 1900))
