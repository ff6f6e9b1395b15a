"""Skew-mitigation utilities for 100 TB-scale joins and aggregations.

AQE's skew-join splitting (on in core/session.py DEFAULT_CONF)
handles most skew at runtime; these helpers cover the cases AQE
can't: broadcast-ineligible skewed joins where one side must be
*salted* (replicated) explicitly, and heavy-hitter detection to
decide when.

Pattern (standard salting): the skewed fact side gets a random salt
in [0, buckets); the dim side is exploded ``buckets``× with every
salt value; the join key becomes (key, salt) — splitting each hot
key's rows across ``buckets`` tasks at the cost of replicating the
smaller side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top_heavy_keys(df: DataFrame, key: str, threshold_ratio: float = 0.01) -> list:
    """Heavy-hitter scan: keys holding more than ``threshold_ratio``
    of all rows (one cheap partial-agg pass — run on a sample at real
    scale)."""
    total = df.count()
    if total == 0:
        return []
    rows = (
        df.groupBy(key)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > total * threshold_ratio)
        .collect()
    )
    return [r[key] for r in rows]


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with explicit salting of the fact side.

    Use when the dim is too big to broadcast AND the fact key is
    skewed. Each fact row gets salt = crc32(row-unique expr) % buckets
    (deterministic given the row, uniform across buckets); the dim is
    exploded buckets×. Output columns = fact ⋈ dim minus helper cols.
    """
    salted_fact = fact.withColumn(
        "_salt", (F.abs(F.hash(F.monotonically_increasing_id())) % buckets).cast("int")
    )
    dim_exploded = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("int") for i in range(buckets)]))
    )
    out = salted_fact.join(dim_exploded, [key, "_salt"], how)
    return out.drop("_salt")
