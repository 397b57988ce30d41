"""connected_components must FAIL LOUDLY when the pair graph's diameter
exceeds the iteration cap instead of silently returning non-fixpoint labels
(ADVICE r2): a long near-dup chain at corpus scale would otherwise get
wrong cluster_ids with no signal."""

from __future__ import annotations

import pytest

from datafusion_distributed_spark.operators import dedup


def _chain(spark, n: int):
    """Path graph 0-1-2-...-n: diameter n, needs ~n propagation rounds."""
    return spark.range(n).selectExpr("id AS doc_a", "id + 1 AS doc_b")


def test_cc_raises_when_cap_too_low(spark, monkeypatch):
    monkeypatch.setattr(dedup, "_CC_MAX_ITERS", 3)
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(_chain(spark, 12)).collect()


def test_cc_converges_single_component(spark):
    labels = dedup.connected_components(_chain(spark, 8)).collect()
    assert len(labels) == 9
    assert {r.cluster_id for r in labels} == {0}
