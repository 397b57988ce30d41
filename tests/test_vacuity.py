"""Vacuity gate: every registered query must be POPULATED at some fixture
scale (oracle-side proxy; the driver battery proves Spark == oracle).

This is the populated-selection discipline of the reference's correctness
suites (/root/reference/tests/tpcds_correctness_test.rs runs at SF1 so no
selection degenerates to empty) made structural: a future entry whose filter
can never match the fixture data fails HERE instead of sailing through the
driver green on 0 = 0 forever — the exact r9 failure mode (sim_filtered_topk
with a 600-char floor over a 577-char-max corpus; text_inverted_index with a
df band below the unigram vocabulary's minimum df).

Deliberate empty-result classes must opt in via ``expect_empty=True`` on the
@query registration; the gate then skips them (and a separate test pins that
the annotation list doesn't silently grow).
"""

from __future__ import annotations

from datafusion_distributed_spark.operators.registry import REGISTRY, _ensure_loaded
from datafusion_distributed_spark.vacuity import vacuous_queries

_ensure_loaded()


def test_no_registered_query_is_vacuous():
    bad = vacuous_queries()
    assert bad == {}, (
        f"queries empty at EVERY fixture scale (their green hash-matches "
        f"prove nothing — fix the selection or annotate expect_empty): {bad}"
    )


def test_gate_trips_on_planted_always_empty_query():
    """Prove the gate actually fires: a planted oracle that is empty at every
    scale must be reported, alongside a planted populated one that must not."""
    bad = vacuous_queries(
        names=[],
        extra_oracles={
            "planted_always_empty": "SELECT 1 AS x WHERE FALSE",
            "planted_populated": "SELECT COUNT(*) AS n FROM nation",
        },
    )
    assert "planted_always_empty" in bad
    assert bad["planted_always_empty"] == [0, 0, 0]
    assert "planted_populated" not in bad


def test_expect_empty_annotations_are_enumerated():
    """expect_empty is an explicit, reviewed list — additions must be
    deliberate (update this pin alongside the registration)."""
    annotated = sorted(n for n, qd in REGISTRY.items() if qd.expect_empty)
    assert annotated == [], (
        f"new expect_empty annotations: {annotated} — review that the empty "
        "result is genuinely the correct answer, then update this pin"
    )
