"""Cost-based stage sizing: unit checks on the estimator arithmetic plus an
end-to-end apply-and-run against the real test parquet."""

from __future__ import annotations

from datafusion_distributed_spark.engine import Engine
from datafusion_distributed_spark.plans.costing import (
    DEFAULT_TARGET_SHUFFLE_BYTES,
    StageSizing,
    advise,
    input_bytes,
)

from .conftest import SF_DIR


def test_scan_partition_arithmetic(tmp_path):
    f = tmp_path / "data.bin"
    f.write_bytes(b"x" * (300 * 1024 * 1024))  # 300 MiB
    s = advise(str(f), parallelism=8)
    assert s.total_input_bytes == 300 * 1024 * 1024
    assert s.scan_partitions == 3  # ceil(300 MiB / 128 MiB)


def test_shuffle_floor_is_parallelism(tmp_path):
    f = tmp_path / "tiny.bin"
    f.write_bytes(b"x" * 1024)
    s = advise(str(f), parallelism=16)
    # Tiny input must still fan out to the full core count, never 1.
    assert s.shuffle_partitions == 16


def test_shuffle_scales_with_bytes_and_rounds_to_waves(tmp_path):
    f = tmp_path / "big.bin"
    gib = 1024 * 1024 * 1024
    f.write_bytes(b"\0" * 0)  # placeholder; size via truncate (sparse)
    with open(f, "wb") as fh:
        fh.truncate(10 * gib)
    s = advise(str(f), parallelism=32)
    by_size = (10 * gib + DEFAULT_TARGET_SHUFFLE_BYTES - 1) // DEFAULT_TARGET_SHUFFLE_BYTES
    assert s.shuffle_partitions >= by_size  # 160 partitions for 10 GiB @ 64 MiB
    assert s.shuffle_partitions % 32 == 0  # whole waves


def test_selectivity_prunes_shuffle_width(tmp_path):
    f = tmp_path / "big.bin"
    with open(f, "wb") as fh:
        fh.truncate(10 * 1024 * 1024 * 1024)
    wide = advise(str(f), parallelism=4)
    narrow = advise(str(f), parallelism=4, shuffle_selectivity=0.01)
    assert narrow.shuffle_partitions < wide.shuffle_partitions


def test_input_bytes_dir_skips_metadata(tmp_path):
    (tmp_path / "part-0.parquet").write_bytes(b"a" * 100)
    (tmp_path / "_SUCCESS").write_bytes(b"")
    (tmp_path / ".hidden").write_bytes(b"b" * 50)
    assert input_bytes(str(tmp_path)) == 100


def test_end_to_end_apply_and_run(spark):
    eng = Engine(spark)
    sizing = eng.advise_stage_sizing(f"{SF_DIR}/lineitem.parquet")
    assert isinstance(sizing, StageSizing)
    assert sizing.shuffle_partitions >= spark.sparkContext.defaultParallelism
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        eng.apply_stage_sizing(sizing)
        assert (
            spark.conf.get("spark.sql.shuffle.partitions")
            == str(sizing.shuffle_partitions)
        )
        df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        out = df.groupBy("l_returnflag").count().collect()
        assert len(out) > 0
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
