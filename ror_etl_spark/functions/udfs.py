"""The Pandas-UDF surface (SURVEY §2.3): Arrow-vectorized scalar UDFs and
grouped-aggregate UDAFs.

These exist to demonstrate the escape hatch, not for the hot path — every
function here has a pure-``F.*`` twin that Catalyst codegens, and the
tests assert the two agree. Use this surface only when the logic genuinely
needs Python (external libraries, models); row-at-a-time ``F.udf`` is
never used anywhere in this engine.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.DoubleType())
def char_entropy(texts: pd.Series) -> pd.Series:
    """Scalar pandas UDF: per-document character-distribution entropy —
    a quality signal whose log-of-frequency-map shape is awkward in pure
    SQL. Arrow ships each batch once; numpy does the math vectorized."""
    import numpy as np

    def one(s: str) -> float:
        if not s:
            return 0.0
        _, counts = np.unique(list(s), return_counts=True)
        p = counts / counts.sum()
        return float(-(p * np.log2(p)).sum())

    return texts.map(one)


@F.pandas_udf(T.DoubleType())
def weighted_mean(values: pd.Series, weights: pd.Series) -> float:
    """Grouped-aggregate pandas UDF (UDAF): Σwv / Σw per group. The
    native twin is sum(v*w)/sum(w); the test pins their equality."""
    denom = float(weights.sum())
    if denom == 0.0:
        return float("nan")
    return float((values * weights).sum() / denom)


GROUP_ZSCORE_SCHEMA = "user_id long, event_id long, value double, zscore double"


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map kernel: z-score of value within the group. Ships one
    Arrow batch per group; sd==0 groups emit 0.0 (not NaN) so downstream
    aggregation stays total."""
    sd = pdf["value"].std(ddof=1)
    mean = pdf["value"].mean()
    z = (pdf["value"] - mean) / sd if sd and sd > 0 else pdf["value"] * 0.0
    return pd.DataFrame(
        {
            "user_id": pdf["user_id"],
            "event_id": pdf["event_id"],
            "value": pdf["value"],
            "zscore": z,
        }
    )


def zscore_per_user(events):
    """groupBy().applyInPandas grouped-map transform — the surface for
    per-group model scoring/resampling that truly needs pandas. The native
    twin (avg/stddev window) is what the hot path uses; tests pin equality."""
    return events.select("user_id", "event_id", "value").groupBy("user_id").applyInPandas(
        _zscore_group, schema=GROUP_ZSCORE_SCHEMA
    )
