"""Local replica of the driver's t2 correctness gate: run every catalog
query through Spark AND its DuckDB oracle on the same parquet, compare
row count, column names, and exact values (order-insensitive).

This is intentionally stricter than "close enough" — the driver hashes
values, so both engines must agree exactly. See queries.py header for how
that exactness is engineered.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from real_estate_data_pipeline_spark.queries import CATALOG

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb(sf_oracle):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_oracle}/{t}.parquet')"
        )
    yield con
    con.close()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("float64")  # unify int widths for sorting/compare
        elif str(df[c].dtype) == "bool":
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_frames_exact(name: str, a: pd.DataFrame, b: pd.DataFrame):
    assert sorted(a.columns) == sorted(b.columns), f"{name}: columns {sorted(a.columns)} vs {sorted(b.columns)}"
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    ca, cb = canon(a), canon(b)
    for col in ca.columns:
        va, vb = ca[col].to_numpy(), cb[col].to_numpy()
        if ca[col].dtype == "float64":
            mism = [
                (i, x, y)
                for i, (x, y) in enumerate(zip(va, vb))
                if not (x == y or (isinstance(x, float) and isinstance(y, float) and math.isnan(x) and math.isnan(y)))
            ]
        else:
            mism = [(i, x, y) for i, (x, y) in enumerate(zip(va, vb)) if x != y]
        assert not mism, f"{name}.{col}: {len(mism)} mismatches, first 3: {mism[:3]}"


ORACLE_QUERIES = [n for n, q in CATALOG.items() if q.oracle is not None]
ROWS_ONLY = [n for n, q in CATALOG.items() if q.oracle is None]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(name, spark, sf_oracle, ddb):
    q = CATALOG[name]
    spark_pdf = q.fn(spark, sf_oracle).toPandas()
    duck_pdf = ddb.sql(q.oracle).df()
    assert_frames_exact(name, spark_pdf, duck_pdf)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(name, spark, sf_oracle):
    q = CATALOG[name]
    df = q.fn(spark, sf_oracle)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import importlib, sys
    sys.path.insert(0, "/root/repo")
    mod = importlib.import_module("__spark_entry__")
    out = mod.entry(spark)
    assert out.count() > 0
