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


def test_leakage_safe_split_keeps_clusters_together(spark):
    """The leakage contract itself: every near-dup cluster's members land in
    ONE split — the doc-grain invariant the aggregated registered query is
    built on (a raw-doc_id hash split violates this whenever a cluster has
    >= 2 members, which the corpus' planted dup clusters guarantee)."""
    import pyspark.sql.functions as F

    from datafusion_distributed_spark.operators.dedup import (
        capped_band_pairs,
        connected_components,
        lsh_bands,
        minhash_signatures,
    )
    from datafusion_distributed_spark.operators.sampling import (
        _SPLIT_SALT,
        _TRAIN_HI,
        _VAL_HI,
        _u32_spark,
    )
    from datafusion_distributed_spark.tables import load_tables

    from .conftest import SF_DIR

    docs = load_tables(spark, SF_DIR)["documents"]
    pairs = capped_band_pairs(lsh_bands(minhash_signatures(docs)))
    clusters = connected_components(pairs)
    keyed = docs.join(clusters, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("group_key"),
    )
    u = _u32_spark(F.concat(F.lit(_SPLIT_SALT), F.col("group_key").cast("string")))
    split = (
        F.when(u < _TRAIN_HI, F.lit("train"))
        .when(u < _VAL_HI, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    per_doc = keyed.select("doc_id", "group_key", split.alias("split"))
    spans = (
        per_doc.groupBy("group_key")
        .agg(F.countDistinct("split").alias("n_splits"), F.count("*").alias("n"))
    )
    bad = spans.filter(F.col("n_splits") > 1).count()
    assert bad == 0, f"{bad} clusters span multiple splits"
    # the invariant is non-vacuous: multi-member clusters exist in the corpus
    assert spans.filter(F.col("n") >= 2).count() > 0
    # and the contract is STRONGER than the raw-doc_id split: at least one
    # multi-member cluster's doc_ids would hash to different splits raw
    raw_u = _u32_spark(F.concat(F.lit(_SPLIT_SALT), F.col("doc_id").cast("string")))
    raw_split = (
        F.when(raw_u < _TRAIN_HI, F.lit("train"))
        .when(raw_u < _VAL_HI, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    raw_spans = (
        per_doc.select("doc_id", "group_key", raw_split.alias("raw"))
        .groupBy("group_key")
        .agg(F.countDistinct("raw").alias("n_raw"))
    )
    assert raw_spans.filter(F.col("n_raw") > 1).count() > 0


def test_cc_pointer_jump_beats_linear_diameter(spark):
    """The r8 pointer-jump upgrade: label-of-label halves the remaining
    propagation distance each round, so a chain FAR longer than the
    iteration cap still converges (plain neighbor-min propagation needs
    ~diameter rounds and would raise). 300 >> 25 = _CC_MAX_ITERS."""
    labels = dedup.connected_components(_chain(spark, 300)).collect()
    assert len(labels) == 301
    assert {r.cluster_id for r in labels} == {0}
