"""Per-row cost lint over the registered battery (round-4 verdict item #2).

The structural plan lint caught every shuffle/UDF anti-pattern but was blind
to per-row constants — the class of regression where a clean narrow plan
hides a 2,000×-per-row expression (the round-4 ``fn_try_arithmetic``
exception storm: 11 s for a scan→agg). This suite:

1. times every NARROW-ONLY registered query at sf0.1 (the bench scale —
   large enough that per-row cost dominates the fixed job overhead) and
   fails if any exceeds ``FIXED_SEC + RATE_SEC_PER_ROW × rows_scanned``;
2. proves the lint has teeth: an injected always-overflow ``try_multiply``
   lane (the exact round-4 defect) must trip the same budget.

Reference analogue: the per-row expression pricing in the distributed
planner's cost model
(/root/reference/src/distributed_planner/statistics/complexity_cpu.rs:211-223)
— a plan whose per-row constant is three orders of magnitude off is a bad
plan even when its shape is optimal.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from datafusion_distributed_spark.operators.registry import REGISTRY, _ensure_loaded
from datafusion_distributed_spark.plans.cost_lint import (
    budget_seconds,
    input_rows,
    is_narrow,
    measure,
    table_row_counts,
)

from .conftest import SF_DIR

_ensure_loaded()

# Cost is measured at the bench scale regardless of the correctness suite's
# SF: per-row signal needs enough rows that RATE × rows >> FIXED.
COST_SF_DIR = os.environ.get("SPARK_GRAFT_COST_SF_DIR", "/root/testdata/sf0.1")


@pytest.fixture(scope="module")
def counts(spark):
    return table_row_counts(spark, COST_SF_DIR)


def _narrow_query_names(spark) -> list[str]:
    # Classify at the small fixture scale: building the frame is free there
    # (iterative operators run their fixpoints at sf0.001 cost) and the
    # narrow/non-narrow distinction is scale-invariant for this class —
    # broadcast-vs-shuffle statistics only affect JOIN plans, which are
    # excluded either way.
    names = []
    for name, qd in sorted(REGISTRY.items()):
        if is_narrow(qd.fn(spark, SF_DIR)):
            names.append(name)
    return names


def test_narrow_battery_per_row_cost(spark, counts):
    names = _narrow_query_names(spark)
    assert names, "classifier found no narrow-only queries — marker drift?"
    violations = []
    for name in names:
        qd = REGISTRY[name]
        rows = input_rows(qd.fn(spark, COST_SF_DIR), counts)
        elapsed = measure(qd.fn, spark, COST_SF_DIR)
        if elapsed > budget_seconds(rows):
            violations.append(
                f"{name}: {elapsed:.2f}s for {rows} rows "
                f"(budget {budget_seconds(rows):.2f}s — "
                f"{elapsed / max(rows, 1) * 1e6:.1f} µs/row)"
            )
    assert violations == [], (
        "narrow-only queries exceeding the per-row cost budget "
        "(per-row JVM constant too high — see cost_lint.py):\n"
        + "\n".join(violations)
    )


def test_lint_flags_exception_storm(spark, counts):
    """The injected round-4 defect — an always-overflow try_multiply whose
    NULL-on-error contract is implemented via a per-row JVM exception —
    must exceed the budget the battery passes under."""

    def storm(s, sf_dir):
        li = s.read.parquet(f"{sf_dir}/lineitem.parquet")
        # l_suppkey + 2 >= 2, so * 2^62 overflows int64 on EVERY row.
        m = F.try_multiply(F.col("l_suppkey") + 2, F.lit(4611686018427387904))
        return li.select(m.alias("m")).agg(
            F.sum(F.when(F.col("m").isNull(), 1).otherwise(0)).alias("n_null")
        )

    df = storm(spark, COST_SF_DIR)
    assert is_narrow(df), "storm plan must be in the narrow class to be a fair probe"
    rows = input_rows(df, counts)
    assert rows > 0
    elapsed = measure(storm, spark, COST_SF_DIR)
    assert elapsed > budget_seconds(rows), (
        f"lint has no teeth: exception storm ran in {elapsed:.2f}s, "
        f"under the {budget_seconds(rows):.2f}s budget for {rows} rows"
    )
