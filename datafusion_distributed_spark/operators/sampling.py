"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus is never trained on wholesale: pipelines stratify-sample by
language/quality and re-weight sources to a target mixture. Random sampling
(``df.sample``) is not reproducible across engines or re-runs; these operators
use **content-hash thresholds** instead — a row is kept iff the first 32 bits
of md5(salt || key) fall below a per-stratum threshold. That makes the sample:

- deterministic (same rows every run, every engine — DuckDB-oracle checkable);
- uniform within each stratum (md5 is uniform on hex strings);
- embarrassingly parallel (a per-row predicate — NO shuffle for the static
  variant; one 20-row broadcast join for the dynamic variant);
- stable under corpus growth (a doc's keep/drop never changes when other
  docs are added — unlike reservoir/limit sampling).

The reference has no sampling surface (bounded OLAP only); this is additive
BASELINE.json scope (SURVEY.md §7 Phase 3).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ._util import t
from .registry import query

# First 8 md5 hex chars as an unsigned 32-bit integer: portable across
# Spark (conv base-16) and DuckDB ('0x' literal cast).
_U32_SPAN = 1 << 32


def _u32_spark(key):
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint")


def _u32_sql(key_sql: str) -> str:
    return f"CAST(('0x' || substring(md5({key_sql}), 1, 8)) AS BIGINT)"


# ---------------------------------------------------------------------------
# Static stratified sample: fixed per-language keep rates, expressed as
# PRE-COMPUTED integer thresholds so Spark and the oracle share exact
# literals (no float rate arithmetic anywhere).
# ---------------------------------------------------------------------------

# lang -> keep rate numerator/denominator (en downsampled hardest — the
# classic "rebalance away from English" mixture step).
_STRATA_RATES: dict[str, tuple[int, int]] = {
    "en": (1, 4),
    "de": (1, 2),
    "es": (1, 2),
    "fr": (1, 2),
    "zh": (3, 4),
}
_DEFAULT_RATE = (1, 1)  # unknown strata pass through

_SALT = "smp:"


def _thresholds() -> dict[str, int]:
    return {
        lang: (num * _U32_SPAN) // den for lang, (num, den) in _STRATA_RATES.items()
    }


def _stratified_oracle() -> str:
    cases = "\n        ".join(
        f"WHEN lang = '{lang}' THEN {thr}" for lang, thr in _thresholds().items()
    )
    default_thr = (_DEFAULT_RATE[0] * _U32_SPAN) // _DEFAULT_RATE[1]
    return f"""
SELECT doc_id, lang, source
FROM documents
WHERE {_u32_sql(f"'{_SALT}' || CAST(doc_id AS VARCHAR)")} <
      CASE {cases} ELSE {default_thr} END
"""


@query("ds_stratified_sample", oracle=_stratified_oracle(), tags=("sampling",))
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep each document iff hash(doc_id) < threshold(lang): a pure per-row
    predicate evaluated inside the scan's whole-stage codegen — zero shuffles,
    and at 100 TB it composes with partition pruning / pushdown untouched."""
    docs = t(spark, sf_dir)["documents"]
    u32 = _u32_spark(F.concat(F.lit(_SALT), F.col("doc_id").cast("string")))
    thr = None
    for lang, th in _thresholds().items():
        cond = F.when(F.col("lang") == lang, F.lit(th))
        thr = cond if thr is None else thr.when(F.col("lang") == lang, F.lit(th))
    thr = thr.otherwise(F.lit((_DEFAULT_RATE[0] * _U32_SPAN) // _DEFAULT_RATE[1]))
    return docs.filter(u32 < thr).select("doc_id", "lang", "source")


# ---------------------------------------------------------------------------
# Weighted mixture (dynamic): equalize the per-source mix — downsample every
# source to the size of the smallest one. Thresholds are computed FROM the
# data (count per source), so this exercises agg -> scalar -> broadcast-join
# -> filter -> agg; all threshold arithmetic is integer division (exact in
# both engines; c_min * 2^32 fits int64 up to c_min ~ 2.1e9 rows — beyond
# that, lift to DECIMAL(38,0), same shape).
# ---------------------------------------------------------------------------

_MIX_ORACLE = f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n_src FROM documents GROUP BY source
),
cmin AS (SELECT MIN(n_src) AS c_min FROM counts),
thr AS (
  SELECT source, n_src, (c_min * {_U32_SPAN}) // n_src AS keep_thr
  FROM counts, cmin
),
sampled AS (
  SELECT d.source, t.n_src, d.doc_id
  FROM documents d
  JOIN thr t ON t.source = d.source
  WHERE {_u32_sql(f"'mix:' || CAST(d.doc_id AS VARCHAR)")} < t.keep_thr
)
SELECT source, MIN(n_src) AS n_src, COUNT(*) AS n_sampled,
       SUM(doc_id) AS doc_id_sum
FROM sampled GROUP BY source
"""


@query("ds_weighted_mixture", oracle=_MIX_ORACLE, tags=("sampling", "mixture"))
def weighted_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equalized source mixture: rate_s = c_min / n_s per source.

    Plan shape at scale: one map-side-combined count aggregate (source is
    low-cardinality), a 1-row global min, a broadcast of the tiny threshold
    dim back onto the corpus scan, then a per-row predicate + final count —
    the corpus itself is never shuffled."""
    docs = t(spark, sf_dir)["documents"]
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    cmin = counts.agg(F.min("n_src").alias("c_min"))
    thr = (
        counts.join(F.broadcast(cmin))
        .select(
            "source",
            "n_src",
            F.expr(f"(c_min * {_U32_SPAN}L) div n_src").alias("keep_thr"),
        )
    )
    u32 = _u32_spark(F.concat(F.lit("mix:"), F.col("doc_id").cast("string")))
    sampled = (
        docs.join(F.broadcast(thr), "source")
        .filter(u32 < F.col("keep_thr"))
        .select("source", "n_src", "doc_id")
    )
    return sampled.groupBy("source").agg(
        F.min("n_src").alias("n_src"),
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("doc_id").alias("doc_id_sum"),
    )


# ---------------------------------------------------------------------------
# Token-budget-capped sample: per source, admit documents in deterministic
# hash order until a token budget fills. The classic "take ~N tokens of
# web / ~M of code" mixture step: unlike a rate sample, the OUTPUT SIZE is
# what's fixed, so over-represented sources are truncated instead of
# thinned. Hash order (not doc_id order) makes the admitted prefix an
# unbiased uniform subsample.
#
# Scale design — bucketed two-pass prefix sum, NOT one window per source.
# A naive `SUM() OVER (PARTITION BY source ORDER BY h)` sorts EVERY row of a
# source inside one task before the budget filter can apply: with a handful
# of sources that is a single-task scan of the whole corpus, the per-task
# self-selection discipline of the reference's work distribution turned
# inside out (/root/reference/src/execution_plans/distributed_leaf.rs:63-130
# — tasks self-select bounded slices; no task owns a whole logical group).
# Instead the hash order is range-split into _PREFIX_BUCKETS contiguous
# buckets (bucket = h div width, so (bucket, h, doc_id) order == (h, doc_id)
# order), and:
#   pass 1: per-(source, bucket) token totals — a map-side-combined
#           aggregate over ~sources × B rows; a prefix sum over that tiny
#           frame classifies each bucket: kept entirely (cumulative end
#           under budget), dropped entirely (starts past budget), or THE
#           boundary bucket (at most one per source).
#   pass 2: only boundary-bucket rows (~1/B of each source, broadcast
#           semi-pruned at the scan) are windowed for the exact row-level
#           cutoff; fully-kept buckets contribute through pass-1 totals
#           without ever being re-sorted.
# Max task input drops from |largest source| to |source|/B, tunable by B,
# and the result is bit-identical to the naive window (the oracle below IS
# the naive spelling).
# ---------------------------------------------------------------------------

_BUDGET_TOKENS = 8_000  # per-source token budget
_BUDGET_SALT = "tb:"
_PREFIX_BUCKETS = 32  # hash-range buckets per source (B); raise with corpus size
_BUCKET_WIDTH = _U32_SPAN // _PREFIX_BUCKETS

# DuckDB spelling of the tokenizer (kept in sync with textstats._TOK_SQL).
_TOK_SQL = "string_split_regex(trim(lower(text)), ' +')"

_TOKEN_BUDGET_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source,
         CAST(len({_TOK_SQL}) AS BIGINT) AS n_tokens,
         {_u32_sql(f"'{_BUDGET_SALT}' || CAST(doc_id AS VARCHAR)")} AS h
  FROM documents
),
runn AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_tokens
  FROM toks
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens,
       CAST(MAX(cum_tokens) AS BIGINT) AS last_cum
FROM runn
WHERE cum_tokens <= {_BUDGET_TOKENS}
GROUP BY source
ORDER BY source
"""
@query(
    "ds_token_budget_sample",
    oracle=_TOKEN_BUDGET_ORACLE,
    tags=("sampling", "token-budget"),
    order_by="source",
)
def token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = t(spark, sf_dir)["documents"]
    toks = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.lower(F.col("text"))), " +"))
        .cast("long")
        .alias("n_tokens"),
        _u32_spark(
            F.concat(F.lit(_BUDGET_SALT), F.col("doc_id").cast("string"))
        ).alias("h"),
    ).withColumn("bucket", F.expr(f"h div {_BUCKET_WIDTH}"))

    # Pass 1: per-(source, bucket) totals — tiny (sources × B rows), so the
    # prefix-sum window over it is metadata-scale, not corpus-scale.
    btot = toks.groupBy("source", "bucket").agg(
        F.count(F.lit(1)).alias("bucket_docs"),
        F.sum("n_tokens").alias("bucket_tokens"),
    )
    w_off = (
        Window.partitionBy("source")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = btot.withColumn(
        "offset_before", F.coalesce(F.sum("bucket_tokens").over(w_off), F.lit(0))
    )
    # Classification: a bucket whose cumulative end fits the budget is kept
    # whole; one that starts past the budget is dropped whole (strict >, so
    # an exactly-at-budget start still windows — exact even for 0-token
    # rows); what remains is the single boundary bucket per source.
    kept_whole = offs.where(
        F.col("offset_before") + F.col("bucket_tokens") <= _BUDGET_TOKENS
    )
    boundary = offs.where(
        (F.col("offset_before") + F.col("bucket_tokens") > _BUDGET_TOKENS)
        & (F.col("offset_before") <= _BUDGET_TOKENS)
    )

    # Pass 2: the row-level cutoff runs ONLY inside the boundary bucket —
    # the broadcast inner join prunes the corpus re-scan to ~|source|/B rows
    # before any sort happens.
    w_in = (
        Window.partitionBy("source", "bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bnd_rows = toks.join(
        F.broadcast(boundary.select("source", "bucket", "offset_before")),
        ["source", "bucket"],
    )
    bnd_kept = bnd_rows.withColumn(
        "cum_tokens", F.col("offset_before") + F.sum("n_tokens").over(w_in)
    ).where(F.col("cum_tokens") <= _BUDGET_TOKENS)
    bnd_agg = bnd_kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("b_docs"),
        F.sum("n_tokens").alias("b_tokens"),
        F.max("cum_tokens").alias("b_last"),
    )

    # Fully-kept buckets contribute via pass-1 totals alone: within such a
    # bucket the last row's cumulative sum is exactly offset_before +
    # bucket_tokens, so no per-row cum is ever materialized for them.
    whole_agg = kept_whole.groupBy("source").agg(
        F.sum("bucket_docs").alias("w_docs"),
        F.sum("bucket_tokens").alias("w_tokens"),
        F.max(F.col("offset_before") + F.col("bucket_tokens")).alias("w_last"),
    )

    return (
        whole_agg.join(bnd_agg, "source", "full_outer")
        .select(
            "source",
            (F.coalesce("w_docs", F.lit(0)) + F.coalesce("b_docs", F.lit(0))).alias(
                "n_docs"
            ),
            (F.coalesce("w_tokens", F.lit(0)) + F.coalesce("b_tokens", F.lit(0)))
            .cast("long")
            .alias("kept_tokens"),
            F.greatest(
                F.coalesce("w_last", F.lit(0)), F.coalesce("b_last", F.lit(0))
            )
            .cast("long")
            .alias("last_cum"),
        )
        .where(F.col("n_docs") > 0)
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Deterministic train/val/test split: each doc lands in exactly one split by
# its content-hash u32 (90/5/5 by integer thresholds — no float rates, no
# randomness). The split assignment is a pure per-row predicate: zero
# shuffles before the tiny per-(source, split) audit aggregate, stable under
# corpus growth (adding docs never moves an existing doc between splits —
# the property reservoir/modulo-on-row-number splits do NOT have).
# ---------------------------------------------------------------------------

_SPLIT_SALT = "split:"
# u32 thresholds: [0, 90%) train, [90%, 95%) val, [95%, 2^32) test.
_TRAIN_HI = (_U32_SPAN * 90) // 100
_VAL_HI = (_U32_SPAN * 95) // 100

_SPLIT_ORACLE = f"""
SELECT source, split, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM (
  SELECT source, n_chars,
         CASE WHEN u < {_TRAIN_HI} THEN 'train'
              WHEN u < {_VAL_HI} THEN 'val'
              ELSE 'test' END AS split
  FROM (SELECT source, n_chars,
               {_u32_sql(f"'{_SPLIT_SALT}' || CAST(doc_id AS VARCHAR)")} AS u
        FROM documents) h
) s
GROUP BY source, split
"""


@query("ds_train_val_test_split", oracle=_SPLIT_ORACLE, tags=("sampling", "split"))
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir)["documents"]
    u = _u32_spark(F.concat(F.lit(_SPLIT_SALT), F.col("doc_id").cast("string")))
    split = (
        F.when(u < _TRAIN_HI, F.lit("train"))
        .when(u < _VAL_HI, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select("source", "n_chars", split.alias("split"))
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Length-bucketed batch assignment (dynamic batching): docs grouped into
# power-of-two token-length buckets, then numbered into fixed-size batches
# within each bucket by deterministic hash order. The batching primitive
# under LLM inference/training dataloaders — padding waste is bounded by the
# bucket width, and the assignment is reproducible.
#
# Scale shape — the same two-pass prefix split as ds_token_budget_sample:
# there are only ~15 length buckets, so a row_number window partitioned by
# bucket alone would scan |corpus|/15 rows in ONE task. Instead the md5
# sort key is range-split on its first two hex chars (256 ordered
# sub-ranges): per-(bucket, sub) counts are metadata-scale, a prefix sum
# over them yields each sub-range's global offset, and the row_number
# window runs per (bucket, sub) — max task input |bucket|/256, and the
# resulting rn is IDENTICAL to the single-window numbering because
# lexicographic order on the full md5 string refines its prefix order.
# ---------------------------------------------------------------------------

_BATCH_SIZE = 16

_BATCHING_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, len(string_split_regex(trim(lower(text)), ' +')) AS n_tokens
  FROM documents
),
bucketed AS (
  -- Smallest power of two >= n_tokens, computed EXACTLY as
  -- 2^bitlength(n-1): float LOG2 (ln-ratio) can land a hair above an
  -- integer in one engine and below in the other, moving docs across
  -- buckets. bin()/length() is integer-exact in both engines.
  SELECT doc_id, n_tokens,
         CASE WHEN n_tokens <= 1 THEN 1
              ELSE CAST(POWER(2, LENGTH(bin(n_tokens - 1))) AS BIGINT)
         END AS bucket
  FROM toks
),
numbered AS (
  SELECT bucket, doc_id, n_tokens,
         ROW_NUMBER() OVER (
           PARTITION BY bucket
           ORDER BY md5('batch:' || CAST(doc_id AS VARCHAR)), doc_id
         ) - 1 AS rn
  FROM bucketed
)
SELECT bucket, CAST(FLOOR(rn / {_BATCH_SIZE}.0) AS BIGINT) AS batch_id,
       COUNT(*) AS batch_rows,
       CAST(SUM(n_tokens) AS BIGINT) AS batch_tokens,
       MIN(doc_id) AS first_doc
FROM numbered
GROUP BY bucket, CAST(FLOOR(rn / {_BATCH_SIZE}.0) AS BIGINT)
"""


@query("ds_length_batching", oracle=_BATCHING_ORACLE, tags=("sampling", "batching"))
def length_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir)["documents"]
    n_tokens = F.size(F.split(F.trim(F.lower(F.col("text"))), " +"))
    bucket = (
        F.when(n_tokens <= 1, F.lit(1))
        .otherwise(
            F.pow(
                F.lit(2.0),
                F.length(F.bin((n_tokens - 1).cast("bigint"))),
            )
        )
        .cast("bigint")
    )
    h = F.md5(F.concat(F.lit("batch:"), F.col("doc_id").cast("string")))
    toks = docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        bucket.alias("bucket"),
        h.alias("h"),
        F.substring(h, 1, 2).alias("sub"),
    )
    from pyspark.sql import Window

    # Pass 1: per-(bucket, sub) counts -> each sub-range's starting offset
    # within its bucket (a prefix-sum window over <= 15 x 256 metadata rows).
    counts = toks.groupBy("bucket", "sub").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = (
        Window.partitionBy("bucket")
        .orderBy("sub")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = counts.withColumn(
        "offset_before", F.coalesce(F.sum("cnt").over(w_off), F.lit(0))
    ).select("bucket", "sub", "offset_before")

    # Pass 2: number rows inside each (bucket, sub) range only.
    w_in = Window.partitionBy("bucket", "sub").orderBy("h", "doc_id")
    numbered = toks.join(F.broadcast(offs), ["bucket", "sub"]).select(
        "bucket",
        "doc_id",
        "n_tokens",
        (F.col("offset_before") + F.row_number().over(w_in) - 1).alias("rn"),
    )
    return (
        numbered.groupBy(
            "bucket", F.floor(F.col("rn") / _BATCH_SIZE).cast("bigint").alias("batch_id")
        )
        .agg(
            F.count(F.lit(1)).alias("batch_rows"),
            F.sum("n_tokens").cast("bigint").alias("batch_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
    )


# ---------------------------------------------------------------------------
# Temperature-scaled source mixture (the multilingual sampling step of
# mC4 / XLM-R style pipelines): sample sources proportional to n_s^alpha
# with alpha = 1/2 — the interpolation between keeping the natural
# distribution (alpha=1) and fully equalizing (alpha=0, ds_weighted_mixture).
# Keep rate r_s = sqrt(n_min / n_s), so the smallest source keeps
# everything and larger sources are downsampled by the square-root ratio.
#
# Engine-portability of the threshold arithmetic: a/b and sqrt are
# IEEE-754 correctly-rounded in both engines (bit-identical), and the
# 2^32 scaling is a pure exponent shift (exact) — no transcendental
# (ln/exp/pow) ever runs, so FLOOR lands on the same integer everywhere.
# Same scale shape as the equalized mixture: tiny count aggregate ->
# 1-row min -> broadcast thresholds -> per-row predicate; the corpus is
# never shuffled.
# ---------------------------------------------------------------------------

_TEMP_SALT = "temp:"

_TEMP_MIX_ORACLE = f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n_src FROM documents GROUP BY source
),
cmin AS (SELECT MIN(n_src) AS n_min FROM counts),
thr AS (
  SELECT source, n_src,
         CAST(FLOOR({_U32_SPAN}.0 * SQRT(CAST(n_min AS DOUBLE) / n_src))
              AS BIGINT) AS keep_thr
  FROM counts, cmin
),
sampled AS (
  SELECT d.source, t.n_src, d.doc_id
  FROM documents d
  JOIN thr t ON t.source = d.source
  WHERE {_u32_sql(f"'{_TEMP_SALT}' || CAST(d.doc_id AS VARCHAR)")} < t.keep_thr
)
SELECT source, MIN(n_src) AS n_src, COUNT(*) AS n_sampled,
       SUM(doc_id) AS doc_id_sum
FROM sampled GROUP BY source
"""


@query(
    "ds_temperature_mixture",
    oracle=_TEMP_MIX_ORACLE,
    tags=("sampling", "mixture"),
)
def temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir)["documents"]
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    nmin = counts.agg(F.min("n_src").alias("n_min"))
    thr = counts.join(F.broadcast(nmin)).select(
        "source",
        "n_src",
        F.floor(
            F.lit(float(_U32_SPAN))
            * F.sqrt(F.col("n_min").cast("double") / F.col("n_src"))
        )
        .cast("bigint")
        .alias("keep_thr"),
    )
    u32 = _u32_spark(F.concat(F.lit(_TEMP_SALT), F.col("doc_id").cast("string")))
    sampled = (
        docs.join(F.broadcast(thr), "source")
        .filter(u32 < F.col("keep_thr"))
        .select("source", "n_src", "doc_id")
    )
    return sampled.groupBy("source").agg(
        F.min("n_src").alias("n_src"),
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("doc_id").alias("doc_id_sum"),
    )


# ---------------------------------------------------------------------------
# Leakage-safe train/val/test split: near-duplicate documents must land in
# the SAME split — hashing raw doc_ids (ds_train_val_test_split above)
# leaks a training document's near-copy into validation, silently inflating
# eval scores (the standard contamination failure mode dedup-aware
# pipelines guard against). The split key is therefore the near-dup
# CLUSTER id (connected components over the capped MinHash-LSH pair graph;
# singleton docs are their own cluster), so every cluster moves as a unit.
#
# The Spark side reuses the iterative connected_components operator; the
# oracle reuses the recursive-CTE transitive closure — the pair proves the
# iterative fixpoint AND the split logic together. Scale: the cluster
# frame is pair-graph-sized (small relative to the corpus); the split is a
# per-row hash over the broadcast-joined cluster id.
# ---------------------------------------------------------------------------


def _leakage_safe_oracle() -> str:
    from .dedup import _cc_oracle

    base = _cc_oracle()
    head, _, _tail = base.rpartition("SELECT node AS doc_id")
    u = _u32_sql(f"'{_SPLIT_SALT}' || CAST(group_key AS VARCHAR)")
    return f"""{head}, clusters AS (
  SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node
),
keyed AS (
  SELECT d.source, d.n_chars,
         COALESCE(c.cluster_id, d.doc_id) AS group_key
  FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id
),
split AS (
  SELECT source, n_chars, group_key,
         CASE WHEN u < {_TRAIN_HI} THEN 'train'
              WHEN u < {_VAL_HI} THEN 'val'
              ELSE 'test' END AS split
  FROM (SELECT source, n_chars, group_key, {u} AS u FROM keyed) h
)
SELECT source, split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT group_key) AS BIGINT) AS n_groups,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM split
GROUP BY source, split
ORDER BY source, split
"""


@query(
    "ds_leakage_safe_split",
    oracle=_leakage_safe_oracle(),
    tags=("sampling", "split", "dedup", "leakage"),
    order_by="source, split",
)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import near_dup_cluster_table

    docs = t(spark, sf_dir)["documents"]
    clusters = near_dup_cluster_table(spark, sf_dir)
    # No broadcast hint on the clusters side: it is one row per document in
    # the capped LSH pair graph — a corpus-fraction-sized table at 100 TB
    # (10-50 % of all docs on a real web corpus), the exact anti-pattern
    # dedup.py's connected_components documents against. AQE picks broadcast
    # when the build side is genuinely small and falls back to a shuffled
    # hash/sort-merge join on doc_id when it isn't.
    keyed = docs.join(clusters, "doc_id", "left").select(
        "source",
        "n_chars",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("group_key"),
    )
    u = _u32_spark(F.concat(F.lit(_SPLIT_SALT), F.col("group_key").cast("string")))
    split = (
        F.when(u < _TRAIN_HI, F.lit("train"))
        .when(u < _VAL_HI, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        keyed.select("source", "n_chars", "group_key", split.alias("split"))
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("group_key").cast("long").alias("n_groups"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("source", "split")
    )
