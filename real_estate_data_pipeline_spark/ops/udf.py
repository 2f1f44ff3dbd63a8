"""Pandas-UDF escape hatch.

The engine's policy is built-ins first (every hot-path operator in this
package is pure Column expressions). When Python is genuinely needed —
a model, a C library, an algorithm with no relational decomposition —
the escape hatch is an Arrow-batched pandas_udf, never a row-at-a-time
``F.udf`` (the reference's only UDF, data_enhancement.py:284-295, pays
per-row Python serialization; pandas UDFs amortize it ~10-100x).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


# return types as DataType objects: DDL strings would need an active
# SparkSession at import time
@pandas_udf(T.DoubleType())
def haversine_km(lat1: pd.Series, lon1: pd.Series, lat2: pd.Series, lon2: pd.Series) -> pd.Series:
    """Great-circle distance in km, vectorized over the whole Arrow batch
    with numpy — the shape any numeric pandas_udf should take."""
    rlat1, rlon1, rlat2, rlon2 = map(np.radians, (lat1, lon1, lat2, lon2))
    dlat = rlat2 - rlat1
    dlon = rlon2 - rlon1
    a = np.sin(dlat / 2.0) ** 2 + np.cos(rlat1) * np.cos(rlat2) * np.sin(dlon / 2.0) ** 2
    return pd.Series(2.0 * 6371.0088 * np.arcsin(np.sqrt(a)))


@pandas_udf(T.ArrayType(T.FloatType()))
def l2_normalize(vec: pd.Series) -> pd.Series:
    """Normalize embedding vectors to unit length (batch-vectorized)."""
    def norm_one(v):
        if v is None:
            return None
        a = np.asarray(v, dtype=np.float32)
        n = float(np.linalg.norm(a))
        return (a / n).tolist() if n > 0 else a.tolist()

    return vec.map(norm_one)
