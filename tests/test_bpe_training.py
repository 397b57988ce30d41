"""BPE merge learning (text_bpe_learn_merges / text_bpe_tokenize_stats):
the tokenizer-training loop's quality claims, proven oracle-side (DuckDB
over the same parquet, reusing the registered queries' own CTE builders).

1. Each merge strictly reduces the corpus token count (every replaced
   occurrence removes one symbol), so tokenization fertility is monotone
   non-increasing in the number of learned merges.
2. The learned merges are distinct pairs with positive counts, and the
   merged spelling is the concatenation of its parts.
3. The multipass boundary-replace reaches its fixpoint within the fixed
   _BPE_PASSES budget: applying the SAME merge chain again changes nothing
   (greedy-leftmost BPE equivalence relies on this).
"""

from __future__ import annotations

import duckdb
import pytest

from datafusion_distributed_spark.operators.textstats import (
    _BPE_PASSES,
    _BPE_STEPS,
    _bpe_oracle,
    _bpe_tokenize_oracle,
)

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def bpe_duck():
    con = duckdb.connect()
    con.execute(
        "CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    yield con
    con.close()


def test_merges_distinct_and_positive(bpe_duck):
    rows = bpe_duck.sql(
        f"SELECT * FROM ({_bpe_oracle()}) ORDER BY step"
    ).fetchall()
    assert len(rows) == _BPE_STEPS
    pairs = [(l, r) for _, l, r, _, _ in rows]
    assert len(set(pairs)) == len(pairs), "a pair was learned twice"
    for step, left, right, merged, cnt in rows:
        assert merged == left + right
        assert cnt > 0


def test_fertility_monotone_in_merges(bpe_duck):
    tok = {
        steps: bpe_duck.sql(
            f"SELECT n_tokens, n_chars FROM ({_bpe_tokenize_oracle(steps)})"
        ).fetchone()
        for steps in (1, 3, _BPE_STEPS)
    }
    chars = {v[1] for v in tok.values()}
    assert len(chars) == 1  # char total independent of merges
    assert tok[1][0] > tok[3][0] > tok[_BPE_STEPS][0]
    # and every tokenization is a real compression of the char stream
    assert tok[_BPE_STEPS][0] < tok[_BPE_STEPS][1]


def test_multipass_replace_reaches_fixpoint(bpe_duck):
    """Applying one more replace pass beyond _BPE_PASSES changes no
    symbolization: the per-merge pass budget covers the worst adjacent
    chain the 16-char word cap can hold."""
    rows = bpe_duck.sql(
        f"SELECT left_sym, right_sym FROM ({_bpe_oracle(1)})"
    ).fetchall()
    left, right = rows[0]
    pat = f" {left} {right} "
    rep = f" {left}{right} "
    sym = "' ' || trim(regexp_replace(w, '(.)', '\\1 ', 'g')) || ' '"
    for _ in range(_BPE_PASSES):
        sym = f"replace({sym}, '{pat}', '{rep}')"
    once_more = f"replace({sym}, '{pat}', '{rep}')"
    n = bpe_duck.sql(f"""
        SELECT COUNT(*) FROM (
          SELECT DISTINCT w FROM (
            SELECT unnest(string_split_regex(trim(lower(text)), ' +')) AS w
            FROM documents)
          WHERE regexp_matches(w, '^[a-z]{{2,16}}$')
        ) WHERE {sym} <> {once_more}
    """).fetchone()[0]
    assert n == 0, f"{n} words still changing after {_BPE_PASSES} passes"
