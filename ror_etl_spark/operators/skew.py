"""Skew-aware join: salting for hot keys.

AQE's skew-join splitting (on by default in the session builder) handles
most skew at runtime by splitting oversized shuffle partitions. Salting is
the explicit fallback for the pathological case AQE can't fix: ONE key so
hot that even a split partition is dominated by it, or a broadcast-unable
dimension joined on a power-law key.

Mechanics: the fact side appends a random-ish salt in [0, n); the
dimension side is exploded n× (one copy per salt value); the join key
becomes (key, salt), spreading the hot key over n reducers. The salt is
derived from a stable row fingerprint (xxhash64 of the whole row), not
rand(), so results are deterministic and retry-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join fact↔dim on an equi key with ``n_salts``-way salting.

    The dim side grows n_salts× (fine — it's the small side by contract);
    the fact side's hot keys spread across n_salts reducers. Output columns
    match a plain ``fact.join(dim, fact_key == dim_key, how)``."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    fact_s = fact.withColumn("__salt", salt.cast("int"))
    dim_s = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = fact_s.join(
        dim_s,
        (F.col(fact_key) == F.col(dim_key)) & (fact_s["__salt"] == dim_s["__salt"]),
        how,
    )
    return joined.drop("__salt")
