"""Explicit skew-join salting — for when AQE's runtime skew split isn't
available (e.g. the skewed side feeds a non-join exchange) or the skew
is known up front.

Technique: replicate the small side R times (one copy per salt value),
give each big-side row a deterministic salt in [0, R), join on
(key, salt). A hot key's rows then spread over R reducer partitions
instead of one. Replication factor R multiplies the small side only —
keep it a broadcast-sized table or modest R.

AQE (`spark.sql.adaptive.skewJoin.enabled`, on by default in
gocrd_spark.session) handles most cases at runtime; this utility is the
explicit, plan-time fallback the north rule calls out.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
    salt_cols: Optional[list[str]] = None,
) -> DataFrame:
    """Skew-resistant equi-join: big ⋈ small on ``on``.

    Output is row-identical to ``big.join(small, on, how)`` for inner
    and left joins (each big row matches exactly one replicated salt
    copy of its key).

    The salt is a DETERMINISTIC function of the big side's columns
    (``salt_cols`` if given, else every column): a nondeterministic salt
    (e.g. from monotonically_increasing_id) feeding a shuffle key can
    re-salt rows differently between task attempts after a fetch
    failure, duplicating or dropping rows across the retry boundary.
    Hot keys still spread because their non-key columns vary per row;
    pass ``salt_cols`` naming a high-cardinality stable column (a row
    id, url, ...) when the default hash-everything is too wide.
    """
    cols = [F.col(c) for c in (salt_cols or big.columns)]
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*cols), F.lit(salt_buckets)).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("_salt")
    replicated_small = small.select("*", salts)
    joined = salted_big.join(replicated_small, [on, "_salt"], how)
    return joined.drop("_salt")
