"""Maintained incremental-ingest index (r12): the production loop is
persist-then-merge — the corpus band table lives on disk and each day's
keeper bands are folded in with sinks.merge_upsert. These tests pin that
the PERSISTED index after shard 1 equals the from-scratch rebuild the
registry entry derives in-plan, so dd_maintained_ingest's day-2 verdicts
are exactly what the disk-backed loop would produce."""

from pyspark.sql import functions as F

from datafusion_distributed_spark.operators.dedup import (
    _capped_band_index,
    _day1_keeper_bands,
    _maintained_index_frames,
)
from datafusion_distributed_spark.operators.registry import REGISTRY, _ensure_loaded
from datafusion_distributed_spark.sinks import merge_upsert

from .conftest import SF_DIR

_ensure_loaded()


def _rowset(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_upserted_index_equals_from_scratch(spark, tmp_path):
    """merge_upsert(base index, day-1 keeper bands) == rebuild from scratch.

    Key = (doc_id, band_idx): one band hash per doc per band, so the delta
    is insert-only here (disjoint doc_ids) and MERGE must reduce to a pure
    append — updated == 0 pins that."""
    arrs, base_bands, s1_bands, _s2 = _maintained_index_frames(spark, SF_DIR)
    keeper_bands = _day1_keeper_bands(arrs, base_bands, s1_bands)

    base_p = str(tmp_path / "index0")
    delta_p = str(tmp_path / "day1_keepers")
    out_p = str(tmp_path / "index1")
    base_bands.write.mode("overwrite").parquet(base_p)
    keeper_bands.write.mode("overwrite").parquet(delta_p)

    stats = merge_upsert(
        spark, base_p, delta_p, out_p, key=["doc_id", "band_idx"]
    )
    assert stats["updated"] == 0  # disjoint shards: pure append
    assert stats["inserted"] == keeper_bands.count()
    assert stats["kept"] == base_bands.count()

    persisted = spark.read.parquet(out_p).select(
        "doc_id", "band_idx", "band_hash"
    )
    rebuilt = base_bands.unionByName(keeper_bands).select(
        "doc_id", "band_idx", "band_hash"
    )
    assert _rowset(persisted) == _rowset(rebuilt)


def test_entry_verdicts_match_persisted_index(spark, tmp_path):
    """dd_maintained_ingest's in-plan index == the capped view of the
    persisted index: running the verdict pipeline over the merge_upsert
    output yields the entry's exact day-2 rows."""
    from datafusion_distributed_spark.operators.dedup import _ingest_verdicts

    arrs, base_bands, s1_bands, s2_bands = _maintained_index_frames(
        spark, SF_DIR
    )
    base_p = str(tmp_path / "i0")
    delta_p = str(tmp_path / "d1")
    out_p = str(tmp_path / "i1")
    base_bands.write.mode("overwrite").parquet(base_p)
    _day1_keeper_bands(arrs, base_bands, s1_bands).write.mode(
        "overwrite"
    ).parquet(delta_p)
    merge_upsert(spark, base_p, delta_p, out_p, key=["doc_id", "band_idx"])

    persisted_capped = _capped_band_index(
        spark.read.parquet(out_p).select("doc_id", "band_idx", "band_hash")
    )
    from_disk = _ingest_verdicts(
        arrs,
        s2_bands,
        persisted_capped,
        arrs.filter(F.col("doc_id") % 10 == 0).select("doc_id"),
    ).withColumn(
        "matched_day1",
        F.when(F.col("best_match_id") % 10 == 1, 1).otherwise(0).cast("int"),
    )
    # Consume from_disk BEFORE invoking the registry entry: the entry's
    # checkpoint slots (see _maintained_index_frames) release the previous
    # invocation's blocks, invalidating frames still derived from them —
    # the documented consume-then-reinvoke slot contract.
    from_disk_rows = _rowset(from_disk)
    entry = REGISTRY["dd_maintained_ingest"].fn(spark, SF_DIR)
    assert from_disk_rows == _rowset(entry)
