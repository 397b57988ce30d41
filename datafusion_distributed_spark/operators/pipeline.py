"""End-to-end corpus-cleaning pipeline as ONE composed DataFrame chain.

The individual training-data operators (dedup.py, textstats.py, sampling.py)
each verify in isolation; this module proves they COMPOSE — the way a real
100 TB pipeline runs them — without materialization barriers between stages:

  exact dedup (keep lowest doc_id per content hash)
    → quality filter (length + token-count bounds)
      → deterministic 50% hash sample
        → per-(lang, source) corpus statistics

Catalyst fuses the filter/sample predicates into the post-dedup projection,
so the whole pipeline is: one scan → the content-hash keeper aggregate +
join (the dedup — groupBy+join, never a content-hash window: exact-dup
groups are unbounded at corpus scale) → narrow predicates → one
partial/final aggregate. The filters and the sample never shuffle anything.

Conventions shared with the component operators (oracle-proven there):
token split `split(trim(lower(text)), ' +')` == DuckDB
`string_split_regex`, md5-u32 deterministic sampling (sampling.py), exact
integer sums with one final double division.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ._util import dbl, t
from .registry import query
from .sampling import _u32_spark, _u32_sql

_PIPE_SALT = "pipe:"
_HALF_SPAN = 1 << 31  # keep iff u32 < 2^31: exactly a 50% deterministic sample

_PIPE_ORACLE = f"""
WITH h AS (
  SELECT doc_id, lang, source, n_chars, text, md5(text) AS ch FROM documents
),
dedup AS (
  SELECT doc_id, lang, source, n_chars, text FROM (
    SELECT h.*, ROW_NUMBER() OVER (PARTITION BY ch ORDER BY doc_id) AS rn FROM h
  ) d WHERE rn = 1
),
quality AS (
  SELECT doc_id, lang, source, n_chars,
         len(string_split_regex(trim(lower(text)), ' +')) AS n_tokens
  FROM dedup
  WHERE n_chars BETWEEN 50 AND 5000
    AND len(string_split_regex(trim(lower(text)), ' +')) >= 10
),
sampled AS (
  SELECT * FROM quality
  WHERE {_u32_sql("'" + _PIPE_SALT + "' || CAST(doc_id AS VARCHAR)")} < {_HALF_SPAN}
)
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
FROM sampled GROUP BY lang, source
"""


@query("pipe_corpus_clean", oracle=_PIPE_ORACLE, tags=("pipeline", "dedup", "sampling"))
def pipe_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir)["documents"]
    # Keeper via groupBy+join, NOT a Window over md5(text): an exact-dup
    # group can be enormous at corpus scale (boilerplate pages duplicated
    # 10^8 times), and a content-hash window puts the whole group on one
    # task. The aggregate partial-combines map-side; the join back keys on
    # (ch, doc_id) — same discipline as dd_block_dedup's keeper table.
    hashed = docs.select("doc_id", "lang", "source", "n_chars", "text").withColumn(
        "ch", F.md5("text")
    )
    keepers = hashed.groupBy("ch").agg(F.min("doc_id").alias("keep_id"))
    deduped = (
        hashed.join(keepers, "ch")
        .filter(F.col("doc_id") == F.col("keep_id"))
        .drop("ch", "keep_id")
    )
    n_tokens = F.size(F.split(F.trim(F.lower(F.col("text"))), " +"))
    quality = deduped.select(
        "doc_id", "lang", "source", "n_chars", n_tokens.alias("n_tokens")
    ).filter(
        F.col("n_chars").between(50, 5000) & (F.col("n_tokens") >= 10)
    )
    u32 = _u32_spark(F.concat(F.lit(_PIPE_SALT), F.col("doc_id").cast("string")))
    sampled = quality.filter(u32 < F.lit(_HALF_SPAN))
    return sampled.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        (dbl(F.sum("n_chars")) / F.count(F.lit(1))).alias("avg_chars"),
    )


# ---------------------------------------------------------------------------
# Incremental aggregation merge: the materialized-view refresh pattern. A
# standing per-(returnflag, linestatus) summary is maintained as PARTIAL
# aggregates per period; refreshing = aggregate only the NEW period and
# merge by key (sums add, counts add, mins min) — never rescan history.
# This query computes the merge of two period partials and must equal the
# oracle's direct aggregate over the full range: the algebraic property
# (partial aggregates form a commutative monoid) that makes incremental
# refresh correct at all. At 100 TB the refresh cost is O(delta), not
# O(history) — the entire point.
# ---------------------------------------------------------------------------

_INC_SPLIT_TS = "TIMESTAMP '1997-01-01'"

_INC_ORACLE = """
SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty,
       MIN(l_orderkey) AS first_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


@query("pipe_incremental_merge", oracle=_INC_ORACLE, tags=("pipeline", "incremental"))
def incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir)["lineitem"]

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("l_returnflag", "l_linestatus").agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.round("l_quantity", 0).cast("bigint"))
            .cast("bigint")
            .alias("total_qty"),
            F.min("l_orderkey").alias("first_order"),
        )

    split = F.col("l_shipdate") < F.expr(_INC_SPLIT_TS)
    history = partial(li.filter(split))
    delta = partial(li.filter(~split))
    merged = history.unionByName(delta)
    return (
        merged.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("n_lines").cast("bigint").alias("n_lines"),
            F.sum("total_qty").cast("bigint").alias("total_qty"),
            F.min("first_order").alias("first_order"),
        )
        .select(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_linestatus").alias("linestatus"),
            "n_lines",
            "total_qty",
            "first_order",
        )
    )


# ---------------------------------------------------------------------------
# Pretraining-corpus pipeline v2: the ROUND-4 composition proof, running the
# corpus-wide block dedup INSIDE a chain —
#
#   block-level dedup + reassembly (dedup.block_dedup_frames)
#     → structural-quality filter (>= half the doc's blocks survived the
#       corpus-wide dedup AND the rebuilt text is still >= 100 chars: drops
#       boilerplate-heavy docs, a ratio + per-doc absolute, so the predicate
#       is stable under corpus growth)
#       → source attribution join (doc_id-keyed; the only columns that move
#         are (doc_id, source) — never text)
#         → deterministic 25% hash sample audited per source
#
# Scale: block dedup's three shuffles + one doc_id-keyed join + one final
# aggregate; the filter and sample are narrow predicates between them.
# ---------------------------------------------------------------------------

_PIPE2_SALT = "pipe2:"
_PIPE2_SPAN = 1 << 30  # u32 < 2^30: exactly a 25% deterministic sample


def _pipe2_oracle() -> str:
    from .dedup import _block_dedup_oracle

    return f"""
WITH bd AS (
  SELECT * FROM ({_block_dedup_oracle().strip()}) x
),
kept AS (
  SELECT bd.doc_id, bd.dedup_len, d.source
  FROM bd JOIN documents d ON d.doc_id = bd.doc_id
  WHERE bd.n_kept * 2 >= bd.n_blocks AND bd.dedup_len >= 100
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(dedup_len) AS BIGINT) AS kept_chars,
       CAST(SUM(CASE WHEN {_u32_sql("'" + _PIPE2_SALT + "' || CAST(doc_id AS VARCHAR)")}
                     < {_PIPE2_SPAN} THEN 1 ELSE 0 END) AS BIGINT) AS sampled_docs
FROM kept GROUP BY source
"""


@query(
    "pipe_pretrain_corpus",
    oracle=_pipe2_oracle(),
    tags=("pipeline", "dedup", "block", "sampling"),
)
def pipe_pretrain_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import block_dedup_frames

    docs = t(spark, sf_dir)["documents"]
    bd = block_dedup_frames(docs)
    kept = bd.filter(
        (F.col("n_kept") * 2 >= F.col("n_blocks")) & (F.col("dedup_len") >= 100)
    ).join(docs.select("doc_id", "source"), "doc_id")
    u32 = _u32_spark(F.concat(F.lit(_PIPE2_SALT), F.col("doc_id").cast("string")))
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dedup_len").cast("bigint").alias("kept_chars"),
        F.sum(F.when(u32 < F.lit(_PIPE2_SPAN), 1).otherwise(0))
        .cast("bigint")
        .alias("sampled_docs"),
    )


# ---------------------------------------------------------------------------
# Snapshot diff (CDC between two pipeline runs): key-wise full-outer
# comparison of two dataset versions, classifying every key as
# added / removed / changed / unchanged and counting per source — the
# regression gate a production corpus pipeline runs after every rebuild
# ("did this release drop 4% of source X?"). Change detection is per-column
# IS DISTINCT FROM (the complement surface of join_null_safe_eq). The two
# "snapshots" are derived deterministically from the documents table
# (disjoint modulus deletions + a text rewrite on a third modulus), so the
# oracle reproduces them exactly.
#
# Scale shape: one doc_id-hash full-outer join of the two snapshots (AQE
# skew-splits a hot key), then a tiny per-source aggregate; the text
# comparison happens inside the join projection — no second pass.
# ---------------------------------------------------------------------------

_DIFF_ORACLE = """
WITH prev AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 13 = 0 THEN reverse(text) ELSE text END AS text
  FROM documents WHERE doc_id % 17 <> 0
),
curr AS (
  SELECT doc_id, source, text FROM documents WHERE doc_id % 19 <> 0
),
j AS (
  SELECT COALESCE(c.source, p.source) AS source,
         CASE
           WHEN p.doc_id IS NULL THEN 'added'
           WHEN c.doc_id IS NULL THEN 'removed'
           WHEN c.text IS DISTINCT FROM p.text THEN 'changed'
           ELSE 'unchanged'
         END AS status
  FROM prev p FULL OUTER JOIN curr c ON p.doc_id = c.doc_id
)
SELECT source,
       CAST(SUM(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
       CAST(SUM(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       CAST(SUM(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
       CAST(SUM(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
FROM j GROUP BY source
"""


@query("pipe_snapshot_diff", oracle=_DIFF_ORACLE, tags=("pipeline", "cdc", "diff"))
def pipe_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir)["documents"]
    prev = docs.filter(F.col("doc_id") % 17 != 0).select(
        F.col("doc_id").alias("p_id"),
        F.col("source").alias("p_source"),
        F.when(F.col("doc_id") % 13 == 0, F.reverse("text"))
        .otherwise(F.col("text"))
        .alias("p_text"),
    )
    curr = docs.filter(F.col("doc_id") % 19 != 0).select(
        F.col("doc_id").alias("c_id"),
        F.col("source").alias("c_source"),
        F.col("text").alias("c_text"),
    )
    j = prev.join(curr, prev["p_id"] == curr["c_id"], "full_outer")
    status = (
        F.when(F.col("p_id").isNull(), "added")
        .when(F.col("c_id").isNull(), "removed")
        .when(~F.col("c_text").eqNullSafe(F.col("p_text")), "changed")
        .otherwise("unchanged")
    )
    flagged = j.select(
        F.coalesce("c_source", "p_source").alias("source"), status.alias("status")
    )
    as_cnt = lambda s: F.sum(F.when(F.col("status") == s, 1).otherwise(0)).cast("long")  # noqa: E731
    return flagged.groupBy("source").agg(
        as_cnt("added").alias("n_added"),
        as_cnt("removed").alias("n_removed"),
        as_cnt("changed").alias("n_changed"),
        as_cnt("unchanged").alias("n_unchanged"),
    )


# ---------------------------------------------------------------------------
# Declarative data-quality constraint report (the Deequ/dbt-test class): a
# fixed suite of table constraints — key uniqueness, completeness (null
# rate), accepted values, value ranges, and referential integrity — each
# evaluated to (violations, checked) in one pass per table plus one
# FK anti-join. The gate a pipeline runs BEFORE publishing a snapshot.
#
# Scale shape: per-table checks fold into a single aggregate over that
# table (conditional sums — one scan each, no shuffle beyond the 1-row
# agg); the FK check is a key-hash anti join (AQE-broadcast when the
# referenced key set is small). Output is one row per constraint.
# ---------------------------------------------------------------------------

_DQ_ORACLE = """
SELECT * FROM (
  SELECT 'orders_pk_unique' AS check_name,
         CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS violations,
         CAST(COUNT(*) AS BIGINT) AS checked
  FROM orders
  UNION ALL
  SELECT 'orders_status_accepted',
         CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) AS BIGINT),
         CAST(COUNT(*) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'orders_totalprice_positive',
         CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT),
         CAST(COUNT(*) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'lineitem_qty_range',
         CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT),
         CAST(COUNT(*) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'lineitem_discount_range',
         CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT),
         CAST(COUNT(*) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'documents_text_complete',
         CAST(SUM(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END) AS BIGINT),
         CAST(COUNT(*) AS BIGINT)
  FROM documents
  UNION ALL
  SELECT 'lineitem_fk_orders',
         CAST((SELECT COUNT(*) FROM lineitem l
               WHERE NOT EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT),
         CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
) checks
ORDER BY check_name
"""


@query(
    "dq_constraint_report",
    oracle=_DQ_ORACLE,
    tags=("pipeline", "data-quality"),
    order_by="check_name",
)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    tt = t(spark, sf_dir)
    orders, lineitem, docs = tt["orders"], tt["lineitem"], tt["documents"]
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731

    def one(name: str, df: DataFrame, violations, checked=None) -> DataFrame:
        agg = df.agg(
            violations.alias("violations"),
            (checked if checked is not None else F.count(F.lit(1)).cast("long")).alias(
                "checked"
            ),
        )
        return agg.select(F.lit(name).alias("check_name"), "violations", "checked")

    checks = [
        one(
            "orders_pk_unique",
            orders,
            (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).cast("long"),
        ),
        one(
            "orders_status_accepted",
            orders,
            cnt(~F.col("o_orderstatus").isin("F", "O", "P")),
        ),
        one("orders_totalprice_positive", orders, cnt(F.col("o_totalprice") <= 0)),
        one(
            "lineitem_qty_range",
            lineitem,
            cnt((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)),
        ),
        one(
            "lineitem_discount_range",
            lineitem,
            cnt((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)),
        ),
        one(
            "documents_text_complete",
            docs,
            cnt(F.col("text").isNull() | (F.length("text") == 0)),
        ),
    ]
    fk_viol = (
        lineitem.select("l_orderkey")
        .join(orders.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("violations"))
    )
    fk = fk_viol.crossJoin(
        lineitem.agg(F.count(F.lit(1)).cast("long").alias("checked"))
    ).select(F.lit("lineitem_fk_orders").alias("check_name"), "violations", "checked")

    out = checks[0]
    for c in checks[1:] + [fk]:
        out = out.unionByName(c)
    return out.orderBy("check_name")
