"""PQ codebook training (sim_pq_train_codebook / sim_pq_train_convergence /
sim_pq_trained_recall): the quality claims behind the trained lane, proven
rather than asserted.

1. Lloyd monotonicity: every k-means step (assign to nearest codeword,
   recompute codewords as member means) can only DECREASE total
   quantization distortion — the mean minimizes within-cell SSE. The
   _PQ_TRAIN_STEPS-step chain's distortion sequence must be monotone
   non-increasing, with a strict drop from the seed assignment.
2. The chain CONVERGES on the fixture: iterating past the fixed horizon,
   the relative per-step improvement drops under epsilon within a small
   step budget (the fixed-T registered entry is not cut off mid-descent).
3. The training is non-trivial: the converged codebook actually differs
   from the seed slices (a no-op fit would satisfy (1) vacuously).
4. K scales with corpus size (r10 VERDICT item 5): the ladder maps the
   fixture sizes to different K.

Distortion checks run oracle-side (DuckDB over the same parquet), reusing
the registered queries' own CTE builders so the test can never drift from
what the entries execute.
"""

from __future__ import annotations

import duckdb
import pytest

from datafusion_distributed_spark.operators.similarity import (
    _PQ_D,
    _PQ_M,
    _PQ_TRAIN_STEPS,
    _lloyd_codebooks,
    _pq_chain_ctes,
    _pq_convergence_oracle,
    _pq_k_for,
    _pq_trained_recall_oracle,
    _trained_codewords,
)

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def pq_duck():
    con = duckdb.connect()
    con.execute(
        "CREATE OR REPLACE VIEW embeddings AS "
        f"SELECT * FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    yield con
    con.close()


def _distortions(con, steps: int) -> list[int]:
    rows = con.sql(
        f"SELECT step, distortion_micro FROM ({_pq_convergence_oracle(steps)})"
        " ORDER BY step"
    ).fetchall()
    assert [r[0] for r in rows] == list(range(1, steps + 1))
    return [r[1] for r in rows]


def test_lloyd_chain_monotone(pq_duck):
    d = _distortions(pq_duck, _PQ_TRAIN_STEPS)
    for t in range(1, len(d)):
        assert d[t] <= d[t - 1], (
            f"Lloyd step {t + 1} INCREASED distortion ({d[t - 1]} -> {d[t]}"
            " micro-units) — the chain is broken"
        )
    # Strictly better than the seed assignment on this corpus: seed
    # codewords are arbitrary vectors, so the member means genuinely move.
    assert d[-1] < d[0]


def test_lloyd_chain_converges(pq_duck):
    """Past the fixed horizon the relative improvement collapses: within 8
    steps it drops under epsilon = 2e-3 — the registered fixed-T entry
    captures the bulk of the descent (measured sf0.001 sequence: 31.1%,
    2.0%, 0.9%, 0.45%, 0.25%, 0.20%, 0.15% per step), not a truncated
    middle of it."""
    d = _distortions(pq_duck, 8)
    rel = [(d[t - 1] - d[t]) / d[t - 1] for t in range(1, len(d))]
    eps = 2e-3
    assert min(rel) < eps, f"no step under epsilon within 8: {rel}"
    assert rel[-1] < eps, f"still descending at step 8: {rel}"


def test_trained_codebook_differs_from_seed(spark):
    chain = _lloyd_codebooks(spark, SF_DIR)
    assert len(chain) == _PQ_TRAIN_STEPS + 1
    seed, trained = chain[0], chain[-1]
    k = len(seed)
    assert len(trained) == k
    assert all(len(c) == _PQ_M * _PQ_D for c in trained)
    assert trained == _trained_codewords(spark, SF_DIR)
    changed = sum(
        1
        for c in range(k)
        for d in range(_PQ_M * _PQ_D)
        if trained[c][d] != seed[c][d]
    )
    # Every populated (code, subspace) cell rewrites its 16 dims; only
    # empty cells keep prior values. Expect the vast majority to move.
    assert changed > (k * _PQ_M * _PQ_D) // 2, (
        f"only {changed} of {k * _PQ_M * _PQ_D} codeword entries "
        "changed — the fit looks like a no-op"
    )


def test_k_scales_with_corpus():
    assert _pq_k_for(490) == 8       # sf0.001 / sf0.01 corpus
    assert _pq_k_for(1990) == 16     # sf0.1 corpus
    assert _pq_k_for(19990) == 32    # 10x probe layout
    assert _pq_k_for(10**9) == 32    # capped


def test_chain_ctes_shared_between_entries():
    """Both trained-lane oracles must derive the codebook from the SAME CTE
    chain text — a drift between the convergence query's chain and the
    recall gate's would silently grade a different codebook than it
    trains."""
    chain = _pq_chain_ctes(_PQ_TRAIN_STEPS)
    assert chain in _pq_convergence_oracle()
    assert chain in _pq_trained_recall_oracle()
