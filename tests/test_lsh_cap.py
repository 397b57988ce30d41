"""Hot-bucket blowup guard for capped MinHash-LSH.

A mass-duplicated document (boilerplate pages in a web corpus) puts n docs in
the SAME band bucket: uncapped LSH emits O(n^2) candidate pairs on one
shuffle key. The capped variant must bound this regardless of n.
"""

from __future__ import annotations

from datafusion_distributed_spark.operators.dedup import (
    _BUCKET_CAP,
    _N_BANDS,
    _band_pairs,
    capped_band_pairs,
    lsh_bands,
    minhash_signatures,
)

_N_DUPES = 120  # every one lands in the same bucket in every band


def _hot_corpus(spark):
    text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, text) for i in range(_N_DUPES)]
    rows += [(1000 + i, f"unique document number {i} with distinct words {i * 7}") for i in range(5)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_capped_pairs_bounded(spark):
    docs = _hot_corpus(spark)
    bands = lsh_bands(minhash_signatures(docs))
    n_capped = capped_band_pairs(bands).count()
    # each of the 8 band buckets contributes at most C(cap, 2) pairs
    assert n_capped <= _N_BANDS * _BUCKET_CAP * (_BUCKET_CAP - 1) // 2
    assert n_capped > 0


def test_uncapped_would_blow_up(spark):
    # sanity: the uncapped join really is quadratic on this corpus, so the
    # cap is load-bearing, not decorative
    docs = _hot_corpus(spark)
    bands = lsh_bands(minhash_signatures(docs))
    n_exact = _band_pairs(bands).count()
    assert n_exact >= _N_DUPES * (_N_DUPES - 1) // 2


def test_capped_pairs_deterministic_members(spark):
    # cap keeps the lowest doc_ids per bucket => pairs only among those
    docs = _hot_corpus(spark)
    bands = lsh_bands(minhash_signatures(docs))
    pairs = capped_band_pairs(bands).collect()
    dupe_ids = {r.doc_a for r in pairs} | {r.doc_b for r in pairs}
    hot = sorted(i for i in dupe_ids if i < 1000)
    assert hot == list(range(_BUCKET_CAP))
