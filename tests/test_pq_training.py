"""PQ codebook training (sim_pq_train_codebook / sim_pq_trained_recall):
the quality claims behind the trained lane, proven rather than asserted.

1. Lloyd monotonicity: one k-means step per subspace (assign to nearest
   seed codeword, recompute codewords as member means) can only DECREASE
   total quantization distortion — the mean minimizes within-cell SSE. If
   the trained codebook's distortion exceeded the seed's, the "training"
   would be noise, not a fit.
2. The training is non-trivial: the trained codebook actually differs from
   the seed slices (a no-op fit would satisfy (1) vacuously).

Both checks run oracle-side (DuckDB over the same parquet), reusing the
registered queries' own CTE builders so the test can never drift from what
the entries execute.
"""

from __future__ import annotations

import duckdb
import pytest

from datafusion_distributed_spark.operators.similarity import (
    _N_QUERIES,
    _PQ_D,
    _PQ_K,
    _PQ_M,
    _centroids,
    _pq_cte_prefix,
    _pq_tcw_cte,
    _pq_trained_recall_oracle,
    _trained_codewords,
)
from datafusion_distributed_spark.tables import load_tables

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


def _total_distortion_seed(con) -> int:
    sql = f"""{_pq_cte_prefix()}
    SELECT CAST(SUM(md) AS BIGINT) FROM (
      SELECT vec_id, m, MIN(d2u) AS md
      FROM sub WHERE vec_id >= {_N_QUERIES} GROUP BY vec_id, m
    )"""
    return con.sql(sql).fetchone()[0]


def _total_distortion_trained(con) -> int:
    # The trained recall oracle's own CTE chain through sub2 (encode vs the
    # coalesced trained codebook); distortion = per-(vec, m) min, summed.
    full = _pq_trained_recall_oracle()
    head = full[: full.index("codes2 AS")].rstrip().rstrip(",")
    sql = f"""{head}
    SELECT CAST(SUM(md) AS BIGINT) FROM (
      SELECT vec_id, m, MIN(d2u) AS md
      FROM sub2 WHERE vec_id >= {_N_QUERIES} GROUP BY vec_id, m
    )"""
    return con.sql(sql).fetchone()[0]


def test_lloyd_step_reduces_distortion(pq_duck):
    seed = _total_distortion_seed(pq_duck)
    trained = _total_distortion_trained(pq_duck)
    assert trained <= seed, (
        f"one Lloyd step INCREASED total distortion ({seed} -> {trained} "
        "micro-units) — the training step is broken"
    )
    # And strictly better on this corpus: seed codewords are arbitrary
    # vectors, so the member means genuinely move.
    assert trained < seed


def test_trained_codebook_differs_from_seed(spark):
    emb_tables = load_tables(spark, SF_DIR)
    emb = emb_tables["embeddings"].selectExpr(
        "vec_id", "cast(embedding as array<double>) as e"
    )
    seed = _centroids(spark, emb, SF_DIR)[:_PQ_K]
    trained = _trained_codewords(spark, SF_DIR)
    assert len(trained) == _PQ_K
    assert all(len(c) == _PQ_M * _PQ_D for c in trained)
    changed = sum(
        1
        for c in range(_PQ_K)
        for d in range(_PQ_M * _PQ_D)
        if trained[c][d] != seed[c][d]
    )
    # Every populated (code, subspace) cell rewrites its 16 dims; only
    # empty cells keep seed values. Expect the vast majority to move.
    assert changed > (_PQ_K * _PQ_M * _PQ_D) // 2, (
        f"only {changed} of {_PQ_K * _PQ_M * _PQ_D} codeword entries "
        "changed — the fit looks like a no-op"
    )


def test_tcw_cte_is_shared_between_entries():
    """Both trained-lane oracles must derive the codebook from the SAME CTE
    text — a drift between the training query's codebook and the recall
    gate's would silently grade a different codebook than it trains."""
    assert _pq_tcw_cte() in _pq_trained_recall_oracle()
