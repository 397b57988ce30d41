"""Collect-join correctness repros — parity with the reference's
multi_task_collect_join_repros.rs.

The reference's bug class: a join that COLLECTS its build side (CollectLeft
hash join, NLJ, cross join) placed in a multi-task stage without the build
side being broadcast joins each task's SLICE of the build side against its
slice of the probe side, silently losing cross-task matches. Its tables
are laid out to make slicing visible: build ids 0..99 split sequentially
across 4 files; probe holds the same ids (each repeated) rotated one file
forward, so a file-aligned task sees DIFFERENT ids from each table and any
per-slice join drops everything.

Spark's planner cannot emit that shape (BroadcastHashJoin ships the
COMPLETE build side; shuffle joins co-partition both inputs; BNLJ
broadcasts one side whole), so the parity test asserts the INVARIANT the
reference's plan-shaping now guarantees: on the same adversarial layout,
every build-side-emitting join returns single-node-identical results under
every execution regime — default, AQE off, maximal scan fan-out (1-file
splits), and broadcasts DISABLED (the reference's hardest arm, where it
caps the stage to one task)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

_FILES = 4
_IDS_PER_FILE = 25
_DUP = 50


@pytest.fixture(scope="module")
def adversarial_tables(tmp_path_factory):
    root = tmp_path_factory.mktemp("collect_repro")
    build = root / "build_side"
    probe = root / "probe_side"
    build.mkdir()
    probe.mkdir()
    for f in range(_FILES):
        ids = list(range(f * _IDS_PER_FILE, (f + 1) * _IDS_PER_FILE))
        pq.write_table(
            pa.table({"id": pa.array(ids, pa.int64())}),
            str(build / f"part-{f}.parquet"),
        )
        # rotated one file forward, each id repeated
        rot = (f + 1) % _FILES
        rids = [
            i
            for i in range(rot * _IDS_PER_FILE, (rot + 1) * _IDS_PER_FILE)
            for _ in range(_DUP)
        ]
        pq.write_table(
            pa.table({"id": pa.array(rids, pa.int64())}),
            str(probe / f"part-{f}.parquet"),
        )
    return str(build), str(probe)


_REGIMES = [
    {},  # default (AQE on, broadcasts on)
    {"spark.sql.adaptive.enabled": "false"},
    {"spark.sql.files.maxPartitionBytes": "1024"},  # one task per file
    {"spark.sql.autoBroadcastJoinThreshold": "-1"},  # broadcasts disabled
    {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.files.maxPartitionBytes": "1024",
    },
]

_CASES = {
    # Case 1 (reference: collect_left_semi_hash_join_is_correct): LeftSemi —
    # every build id has probe matches, but never in the same file slice.
    "left_semi": (
        "SELECT id FROM build_side WHERE id IN (SELECT id FROM probe_side)",
        sorted(range(_FILES * _IDS_PER_FILE)),
    ),
    # Case 2 (left_anti): no id is missing from the probe side globally,
    # so the anti join must be EMPTY — per-slice it would return everything.
    "left_anti": (
        "SELECT id FROM build_side "
        "WHERE id NOT IN (SELECT id FROM probe_side)",
        [],
    ),
    # Case 3 (build-side-emitting NLJ): non-equi theta join counting
    # strictly-greater probe rows per build id — needs the FULL probe side
    # for every build row.
    "nlj_theta": (
        "SELECT b.id, (SELECT count(*) FROM probe_side p WHERE p.id > b.id) "
        "AS n_greater FROM build_side b",
        [
            (i, (_FILES * _IDS_PER_FILE - 1 - i) * _DUP)
            for i in range(_FILES * _IDS_PER_FILE)
        ],
    ),
    # Case 4 (cross join): total pair count is |build| * |probe| only if
    # every task sees the complete collected side.
    "cross": (
        "SELECT count(*) AS n FROM build_side CROSS JOIN probe_side",
        [(_FILES * _IDS_PER_FILE * _FILES * _IDS_PER_FILE * _DUP,)],
    ),
}


@pytest.mark.parametrize("regime", range(len(_REGIMES)))
@pytest.mark.parametrize("case", sorted(_CASES))
def test_collect_join_matches_single_node(spark, adversarial_tables, case, regime):
    build, probe = adversarial_tables
    sql, expected = _CASES[case]
    confs = _REGIMES[regime]
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        spark.read.parquet(build).createOrReplaceTempView("build_side")
        spark.read.parquet(probe).createOrReplaceTempView("probe_side")
        got = sorted(tuple(r) for r in spark.sql(sql).collect())
        want = sorted(
            e if isinstance(e, tuple) else (e,) for e in expected
        )
        assert got == want, f"{case} under regime {confs}: lost cross-task matches"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
