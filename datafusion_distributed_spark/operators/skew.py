"""Skew-mitigation utilities: salted joins for hot keys.

AQE's skew-join splitting (enabled in engine.RUNTIME_CONFS) handles skewed
SORT-MERGE joins automatically at runtime; salting is the explicit technique
for the cases AQE cannot rewrite (e.g. aggregation-below-join shapes, or when
a deterministic plan is required). The reference leaves skew to its
cost-model task sizing (/root/reference/docs/source/learn/
03-how-adaptive-query-execution-works.md); on Spark the standard remedy is to
spread one hot key across N sub-keys:

  left gets a pseudo-random salt in [0, N) per ROW;
  right is replicated N times (one copy per salt value);
  the join key becomes (key, salt) — a hot key now lands on N partitions.

Result-identical to the unsalted join (each left row still meets every right
row of its key exactly once) — proven by tests/test_skew.py on a synthetic
hot-key dataset.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ._util import t
from .registry import query


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` and ``right`` on ``key`` with the left side's hot
    keys spread across ``n_salts`` shuffle partitions.

    The left salt is derived from a per-row hash (cheap, deterministic per
    row content, uniform); the right side is exploded once per salt value —
    replication cost is n_salts × |right|, so use this when right is the
    smaller relation and too big (or the key too hot) to broadcast.

    Only joins where the REPLICATED (right) side never emits unmatched rows
    are result-identical under salting: for right/full outer joins each
    unmatched right row would surface once per salt value (n_salts duplicate
    null-extended rows), so those are rejected."""
    safe = {"inner", "left", "leftouter", "left_outer",
            "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti"}
    if how.lower() not in safe:
        raise ValueError(
            f"salted_join: how={how!r} is not salt-safe (the replicated right "
            f"side would emit unmatched rows once per salt); use one of {sorted(safe)}"
        )
    salt = F.pmod(F.hash(*left.columns), F.lit(n_salts)).alias("_salt")
    left_s = left.withColumn("_salt", salt)
    right_s = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = left_s.join(right_s, on=[key, "_salt"], how=how)
    return joined.drop("_salt")


# ---------------------------------------------------------------------------
# Registry entry: salted fact-dim join, oracle-checked against the PLAIN
# join (salting must be result-invariant). The fact's supplier key is the
# salted axis; per-nation revenue is the aggregate. n_salts=8 keeps the
# replicated dim at 8x|supplier| — the trade this operator exists for.
# ---------------------------------------------------------------------------

_SALTED_ORACLE = """
SELECT s.s_nationkey AS nationkey, COUNT(*) AS n_lines,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
         / 100.0 AS total_price
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
GROUP BY s.s_nationkey
"""


@query("join_salted_skew", oracle=_SALTED_ORACLE, tags=("join", "skew"))
def salted_skew_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prove salting is result-invariant under the driver's oracle gate
    (unit equivalence lives in tests/test_skew.py; this puts the operator
    on the same differential footing as every other registry query)."""
    tb = t(spark, sf_dir)
    fact = tb["lineitem"].select(
        F.col("l_suppkey").alias("sk"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
    )
    dim = tb["supplier"].select(
        F.col("s_suppkey").alias("sk"), F.col("s_nationkey").alias("nationkey")
    )
    joined = salted_join(fact, dim, "sk", n_salts=8)
    return joined.groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        (F.sum("cents").cast("double") / 100.0).alias("total_price"),
    )
