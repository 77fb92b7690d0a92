"""Skew mitigation: salted equi-join for hot keys.

AQE's skew-join splitting is the first line of defense (on by default in
session.py) — it re-plans oversized shuffle partitions at runtime. Salting
is the explicit fallback for when the skew is known ahead of time (the
reference's EU27-style rollup geos: a handful of keys carrying a large
share of rows) or when AQE is unavailable (e.g. a sort-merge join feeding a
streaming stage).

Shape: the big (skewed) side gets a uniform random salt in [0, buckets);
the small side is replicated `buckets` times via a literal-range explode.
The join key becomes (key, salt), so one hot key fans out over `buckets`
reducers. Cost: small side inflates by `buckets` — use only when small
really is dimension-sized, which is exactly the hot-key join pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Equi-join `big` to `small` on `on`, salted across `buckets` reducers.

    Row-level semantics are identical to ``big.join(small, on, how)`` for
    'inner' and 'left' joins (each big row carries exactly one salt value;
    the replicated small side guarantees its match exists in that bucket).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (semantics proof)")
    b = big.withColumn(SALT_COL, (F.rand(seed) * buckets).cast("int"))
    s = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return b.join(s, on + [SALT_COL], how).drop(SALT_COL)
