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
from pyspark.sql import DataFrame


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
