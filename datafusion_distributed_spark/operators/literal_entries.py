"""Registry entries that execute the LITERAL reference texts.

The literal lane (datafusion_distributed_spark/literal.py +
literal_tpcds.py) runs verbatim benchmark texts over schema-mapped views:
TPC-H 22/22, TPC-DS 99/99, ClickBench 43/43 — 164 reference texts, each
differentially compared against DuckDB in tests/test_literal_sql.py
(79 TPC-DS texts value-proven on populated selections at sf0.001, 8 more at
sf0.01; the remainder agree-on-empty at tested scales — tier split documented
at tests/test_literal_sql.py::_SPARSE_NOTES). These registry entries put
a subset of that lane behind the driver's own correctness gate: the Spark
side executes the VERBATIM reference text end-to-end (views + spark.sql);
the oracle re-derives the same result over the identical view derivations
spelled as DuckDB CTEs (``lit_*`` names so the CTE bodies can reference the
driver's bare-named base views without self-reference).

Only integer-exact texts are registered (counts, int sums, avg = exact int
sum / count): the driver's hash gate is bit-exact, and the literal texts
mandate engine-native float summation everywhere else — those run under the
9-significant-digit compare in the pytest lane instead.

Reference parity: the reference's own proof runs the same files
(/root/reference/tests/tpch_correctness_test.rs:24-120,
tests/clickbench_correctness_test.rs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..literal import run_literal_sql, view_definitions
from .registry import query


def _lit_ctes(*names: str) -> str:
    """WITH-clause body defining lit_<name> CTEs from the shared view
    derivations (DuckDB dialect, referencing the driver's bare views)."""
    defs = view_definitions("duck", lambda n: n)
    return ",\n".join(f"lit_{n} AS ({defs[n]})" for n in names)


_CB_Q0_ORACLE = f"""
WITH {_lit_ctes("hits")}
SELECT COUNT(*) AS n_hits FROM lit_hits
"""


@query(
    "lit_cb_q0_count",
    oracle=_CB_Q0_ORACLE,
    tags=("literal", "clickbench"),
)
def lit_cb_q0(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_literal_sql(spark, sf_dir, "clickbench", "q0").toDF("n_hits")


_CB_Q2_ORACLE = f"""
WITH {_lit_ctes("hits")}
SELECT SUM("AdvEngineID") AS sum_adv, COUNT(*) AS n_hits,
       AVG("ResolutionWidth") AS avg_width
FROM lit_hits
"""


@query(
    "lit_cb_q2_simple_aggregates",
    oracle=_CB_Q2_ORACLE,
    tags=("literal", "clickbench"),
)
def lit_cb_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    # avg_width = exact int sum / count: both engines divide the same exact
    # integers in double — bit-identical.
    return run_literal_sql(spark, sf_dir, "clickbench", "q2").toDF(
        "sum_adv", "n_hits", "avg_width"
    )


_CB_Q1_ORACLE = f"""
WITH {_lit_ctes("hits")}
SELECT COUNT(*) AS n_adv FROM lit_hits WHERE "AdvEngineID" <> 0
"""


@query(
    "lit_cb_q1_filtered_count",
    oracle=_CB_Q1_ORACLE,
    tags=("literal", "clickbench", "count"),
)
def lit_cb_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_literal_sql(spark, sf_dir, "clickbench", "q1").toDF("n_adv")


_CB_Q5_ORACLE = f"""
WITH {_lit_ctes("hits")}
SELECT COUNT(DISTINCT "SearchPhrase") AS n_phrases FROM lit_hits
"""


@query(
    "lit_cb_q5_distinct_phrases",
    oracle=_CB_Q5_ORACLE,
    tags=("literal", "clickbench", "distinct"),
)
def lit_cb_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_literal_sql(spark, sf_dir, "clickbench", "q5").toDF("n_phrases")


_CB_Q6_ORACLE = f"""
WITH {_lit_ctes("hits")}
SELECT MIN("EventDate") AS min_date, MAX("EventDate") AS max_date FROM lit_hits
"""


@query(
    "lit_cb_q6_date_range",
    oracle=_CB_Q6_ORACLE,
    tags=("literal", "clickbench"),
)
def lit_cb_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_literal_sql(spark, sf_dir, "clickbench", "q6").toDF(
        "min_date", "max_date"
    )


_TPCH_Q4_ORACLE = f"""
WITH {_lit_ctes("lineitem", "orders")}
SELECT o_orderpriority, COUNT(*) AS order_count
FROM lit_orders
WHERE o_orderdate >= DATE '1995-07-01'
  AND o_orderdate < DATE '1995-10-01'
  AND EXISTS (SELECT 1 FROM lit_lineitem
              WHERE l_orderkey = o_orderkey
                AND l_commitdate < l_receiptdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query(
    "lit_tpch_q4_shifted",
    oracle=_TPCH_Q4_ORACLE,
    tags=("literal", "tpch", "exists"),
    order_by="o_orderpriority",
)
def lit_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Verbatim q4 text with date literals shifted +2y into the driver's
    # 1995-2001 range (1993-07-01 -> 1995-07-01); the oracle spells the
    # shifted dates directly.
    return run_literal_sql(spark, sf_dir, "tpch", "q4", date_shift_years=2)


_TPCH_Q12_ORACLE = f"""
WITH {_lit_ctes("lineitem", "orders")}
SELECT l_shipmode,
       SUM(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH'
                THEN 1 ELSE 0 END) AS high_line_count,
       SUM(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH'
                THEN 1 ELSE 0 END) AS low_line_count
FROM lit_orders
JOIN lit_lineitem ON o_orderkey = l_orderkey
WHERE l_shipmode IN ('MAIL', 'SHIP')
  AND l_commitdate < l_receiptdate
  AND l_shipdate < l_commitdate
  AND l_receiptdate >= DATE '1996-01-01'
  AND l_receiptdate < DATE '1997-01-01'
GROUP BY l_shipmode
ORDER BY l_shipmode
"""


@query(
    "lit_tpch_q12_shifted",
    oracle=_TPCH_Q12_ORACLE,
    tags=("literal", "tpch"),
    order_by="l_shipmode",
)
def lit_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_literal_sql(spark, sf_dir, "tpch", "q12", date_shift_years=2)


# ---------------------------------------------------------------------------
# TPC-DS promotions (round 7): verbatim reference texts whose outputs are
# integer-exact under the full-spec star views — counts, sums of the views'
# integer-valued monetary doubles (literal_tpcds floors every money column,
# so double sums are order-exact), and string keys. The Spark side executes
# the VERBATIM file text; the oracle is the SAME text with the bare star
# names rewritten to lit_-prefixed CTEs of the identical view derivations
# (the driver session owns the bare driver-table names, so TPC-DS's
# `customer`/`store` must not collide).
# ---------------------------------------------------------------------------

import os as _os
import re as _re

from ..literal import REFERENCE_QUERIES, load_literal_text


def _tpcds_oracle(
    qname: str,
    tables: tuple[str, ...],
    renames: tuple[str, ...],
    date_shift_years: int = 0,
    year_shift: int = 0,
) -> str:
    """DuckDB oracle for a verbatim TPC-DS text: lit_ CTEs + name rewrite +
    positional column renames (the driver compares by column NAME, and the
    texts leave aggregates unaliased with engine-specific auto-names).
    Shift parameters mirror run_literal_sql's — the SAME rewritten text
    feeds both engines (the lit_tpch_*_shifted contract)."""
    text = load_literal_text(
        "tpcds", qname, date_shift_years=date_shift_years, year_shift=year_shift
    )
    # Longest-first so `store` never clips `store_sales`/`store_returns`;
    # \b is safe because '_' is a word character (no boundary inside names).
    # Rewrite only OUTSIDE single-quoted literals: q93 filters
    # r_reason_desc = 'reason 28', and a blind rewrite turned that literal
    # into 'lit_reason 28' (selection silently empty — caught by the
    # sf0.01 differential before registration).
    segments = text.split("'")
    for t in sorted(tables, key=len, reverse=True):
        pat = _re.compile(rf"\b{t}\b")
        for i in range(0, len(segments), 2):  # even segments = outside quotes
            segments[i] = pat.sub(f"lit_{t}", segments[i])
    text = "'".join(segments)
    cols = ", ".join(renames)
    ctes = ",\n".join(f"lit_{n} AS ({_VIEW_DEFS[n]})" for n in tables)
    return f"WITH {ctes}\nSELECT * FROM (\n{text}\n) AS _r({cols})"


_VIEW_DEFS = view_definitions("duck", lambda n: n)
# TPC-DS's `customer` view key is `tpcds_customer` in the shared defs.
_VIEW_DEFS["customer"] = _VIEW_DEFS["tpcds_customer"]

if _os.path.isdir(REFERENCE_QUERIES):

    @query(
        "lit_tpcds_q1_returns_above_avg",
        oracle=_tpcds_oracle(
            "q1",
            ("store_returns", "date_dim", "store", "customer"),
            ("c_customer_id",),
        ),
        tags=("literal", "tpcds", "returns", "correlated-subquery"),
    )
    def lit_tpcds_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Verbatim q1: correlated CTE over store_returns (customers whose
        # 2000 returns exceed 1.2x their store's average). Integer-exact:
        # sr_return_amt is an integer-valued double, AVG is one exact-sum /
        # count division, the output is a string key.
        return run_literal_sql(spark, sf_dir, "tpcds", "q1").toDF("c_customer_id")

    @query(
        "lit_tpcds_q42_category_november",
        oracle=_tpcds_oracle(
            "q42",
            ("date_dim", "store_sales", "item"),
            ("d_year", "i_category_id", "i_category", "sum_sales"),
        ),
        tags=("literal", "tpcds", "star-join"),
    )
    def lit_tpcds_q42(spark: SparkSession, sf_dir: str) -> DataFrame:
        return run_literal_sql(spark, sf_dir, "tpcds", "q42").toDF(
            "d_year", "i_category_id", "i_category", "sum_sales"
        )

    @query(
        "lit_tpcds_q43_store_weekday_sales",
        oracle=_tpcds_oracle(
            "q43",
            ("date_dim", "store_sales", "store"),
            ("s_store_name", "s_store_id", "sun_sales", "mon_sales",
             "tue_sales", "wed_sales", "thu_sales", "fri_sales", "sat_sales"),
        ),
        tags=("literal", "tpcds", "pivot"),
    )
    def lit_tpcds_q43(spark: SparkSession, sf_dir: str) -> DataFrame:
        return run_literal_sql(spark, sf_dir, "tpcds", "q43").toDF(
            "s_store_name", "s_store_id", "sun_sales", "mon_sales",
            "tue_sales", "wed_sales", "thu_sales", "fri_sales", "sat_sales"
        )

    @query(
        "lit_tpcds_q50_return_lag_bands",
        oracle=_tpcds_oracle(
            "q50",
            ("store_sales", "store_returns", "store", "date_dim"),
            ("s_store_name", "s_company_id", "s_street_number",
             "s_street_name", "s_street_type", "s_suite_number", "s_city",
             "s_county", "s_state", "s_zip", "d30", "d31_60", "d61_90",
             "d91_120", "d_over_120"),
        ),
        tags=("literal", "tpcds", "returns", "banding"),
    )
    def lit_tpcds_q50(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Sales-to-returns join on (item_sk, ticket_number) with the return
        # lag banded into count columns — all integer counts.
        return run_literal_sql(spark, sf_dir, "tpcds", "q50").toDF(
            "s_store_name", "s_company_id", "s_street_number",
            "s_street_name", "s_street_type", "s_suite_number", "s_city",
            "s_county", "s_state", "s_zip", "d30", "d31_60", "d61_90",
            "d91_120", "d_over_120"
        )

    @query(
        "lit_tpcds_q62_ship_lag_bands",
        oracle=_tpcds_oracle(
            "q62",
            ("web_sales", "warehouse", "ship_mode", "web_site", "date_dim"),
            ("w_substr", "sm_type", "web_name", "d30", "d31_60", "d61_90",
             "d91_120", "d_over_120"),
        ),
        tags=("literal", "tpcds", "banding"),
    )
    def lit_tpcds_q62(spark: SparkSession, sf_dir: str) -> DataFrame:
        return run_literal_sql(spark, sf_dir, "tpcds", "q62").toDF(
            "w_substr", "sm_type", "web_name", "d30", "d31_60", "d61_90",
            "d91_120", "d_over_120"
        )

    @query(
        "lit_tpcds_q3_brand_november",
        oracle=_tpcds_oracle(
            "q3",
            ("date_dim", "store_sales", "item"),
            ("d_year", "brand_id", "brand", "sum_agg"),
        ),
        tags=("literal", "tpcds", "star-join"),
    )
    def lit_tpcds_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Verbatim q3: manufacturer-filtered November brand report. The
        # ORDER BY (d_year, sum_agg DESC, brand_id) is a total order —
        # brand_id is a group key — so LIMIT 100 is deterministic.
        return run_literal_sql(spark, sf_dir, "tpcds", "q3").toDF(
            "d_year", "brand_id", "brand", "sum_agg"
        )

    @query(
        "lit_tpcds_q19_cross_zip_brands",
        oracle=_tpcds_oracle(
            "q19",
            ("date_dim", "store_sales", "item", "customer",
             "customer_address", "store"),
            ("brand_id", "brand", "i_manufact_id", "i_manufact", "ext_price"),
        ),
        tags=("literal", "tpcds", "star-join"),
    )
    def lit_tpcds_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Verbatim q19: brand report for customers shopping outside their
        # own zip (SUBSTRING(ca_zip,1,5) <> SUBSTRING(s_zip,1,5)). ORDER BY
        # lists every group key after the sum — fully deterministic.
        return run_literal_sql(spark, sf_dir, "tpcds", "q19").toDF(
            "brand_id", "brand", "i_manufact_id", "i_manufact", "ext_price"
        )

    @query(
        "lit_tpcds_q45_zip_or_item_web",
        oracle=_tpcds_oracle(
            "q45",
            ("web_sales", "customer", "customer_address", "date_dim", "item"),
            ("ca_zip", "ca_city", "sum_sales"),
        ),
        tags=("literal", "tpcds", "disjunctive-subquery"),
    )
    def lit_tpcds_q45(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Verbatim q45: zip-prefix OR uncorrelated-IN-subquery disjunction;
        # ORDER BY is the full group key (ca_zip, ca_city).
        return run_literal_sql(spark, sf_dir, "tpcds", "q45").toDF(
            "ca_zip", "ca_city", "sum_sales"
        )

    @query(
        "lit_tpcds_q52_manager_brand_november",
        oracle=_tpcds_oracle(
            "q52",
            ("date_dim", "store_sales", "item"),
            ("d_year", "brand_id", "brand", "ext_price"),
        ),
        tags=("literal", "tpcds", "star-join"),
    )
    def lit_tpcds_q52(spark: SparkSession, sf_dir: str) -> DataFrame:
        return run_literal_sql(spark, sf_dir, "tpcds", "q52").toDF(
            "d_year", "brand_id", "brand", "ext_price"
        )

    @query(
        "lit_tpcds_q55_brand_report",
        oracle=_tpcds_oracle(
            "q55",
            ("date_dim", "store_sales", "item"),
            ("brand_id", "brand", "ext_price"),
        ),
        tags=("literal", "tpcds", "star-join"),
    )
    def lit_tpcds_q55(spark: SparkSession, sf_dir: str) -> DataFrame:
        return run_literal_sql(spark, sf_dir, "tpcds", "q55").toDF(
            "brand_id", "brand", "ext_price"
        )

    @query(
        "lit_tpcds_q96_evening_count",
        oracle=_tpcds_oracle(
            "q96",
            ("store_sales", "household_demographics", "time_dim", "store"),
            ("n",),
        ),
        tags=("literal", "tpcds", "count"),
    )
    def lit_tpcds_q96(spark: SparkSession, sf_dir: str) -> DataFrame:
        # 8:30pm+ shoppers with 7 dependents at store 'ese' — a pure count
        # through the generated time_dim/household_demographics dims.
        return run_literal_sql(spark, sf_dir, "tpcds", "q96").toDF("n")

    # -----------------------------------------------------------------------
    # Round-8 promotions: more integer-exact verbatim texts behind the
    # driver's bit-exact hash gate. ClickBench q15 was evaluated and
    # REJECTED: its top-10-users-by-count cut has count TIES at the rank-10
    # boundary at both sf0.01 and sf0.1 (builder probe: ...81,80,80,80,80...
    # / ...87,87,87,87...), so LIMIT 10 is not deterministic across engines.
    # CB q3 (AVG of int64 UserID) was rejected too: Spark sums bigint as
    # DOUBLE (order-dependent at ~9e18 magnitudes) while DuckDB sums exactly
    # in HUGEINT. The shapes below are count/distinct-count only.
    # -----------------------------------------------------------------------

    _Q88_COLS = ("h8_30_to_9", "h9_to_9_30", "h9_30_to_10", "h10_to_10_30",
                 "h10_30_to_11", "h11_to_11_30", "h11_30_to_12",
                 "h12_to_12_30")

    @query(
        "lit_tpcds_q88_store_hour_bands",
        oracle=_tpcds_oracle(
            "q88",
            ("store_sales", "household_demographics", "time_dim", "store"),
            _Q88_COLS,
        ),
        tags=("literal", "tpcds", "count", "multiband"),
    )
    def lit_tpcds_q88(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Verbatim q88: eight half-hour store-traffic counts cross-joined
        # into one row (the reference's multi-scan shape) — all integers.
        return run_literal_sql(spark, sf_dir, "tpcds", "q88").toDF(*_Q88_COLS)

    @query(
        "lit_tpcds_q92_excess_discount",
        oracle=_tpcds_oracle(
            "q92",
            ("web_sales", "item", "date_dim"),
            ("excess_discount_amount",),
        ),
        tags=("literal", "tpcds", "correlated-subquery"),
    )
    def lit_tpcds_q92(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Verbatim q92: discounts above 1.3x the per-item window average.
        # The threshold is avg (exact-int-sum / count) * 1.3 — identical
        # double math on identical exact inputs in both engines — and the
        # output SUM is over integer-valued monetary doubles (exact).
        return run_literal_sql(spark, sf_dir, "tpcds", "q92").toDF(
            "excess_discount_amount"
        )

    _Q95_COLS = ("order_count", "total_shipping_cost", "total_net_profit")

    @query(
        "lit_tpcds_q95_returned_multiwarehouse",
        oracle=_tpcds_oracle(
            "q95",
            ("web_sales", "web_returns", "date_dim", "customer_address",
             "web_site"),
            _Q95_COLS,
        ),
        tags=("literal", "tpcds", "semi-join", "distinct"),
    )
    def lit_tpcds_q95(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Verbatim q95: multi-warehouse returned web orders — a self-join
        # CTE feeding two IN subqueries, COUNT(DISTINCT) + exact
        # integer-valued money sums; single-row output.
        return run_literal_sql(spark, sf_dir, "tpcds", "q95").toDF(*_Q95_COLS)

    _PROMO_AVG_COLS = ("i_item_id", "agg1", "agg2", "agg3", "agg4")

    @query(
        "lit_tpcds_q7_promo_store_avgs",
        oracle=_tpcds_oracle(
            "q7",
            ("store_sales", "customer_demographics", "date_dim", "item",
             "promotion"),
            _PROMO_AVG_COLS,
        ),
        tags=("literal", "tpcds", "star-join", "avg"),
        order_by="i_item_id",
    )
    def lit_tpcds_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Verbatim q7: per-item AVGs of integer-valued monetary doubles for
        # demographics-filtered promo sales. avg = exact-integer-sum /
        # count, divided identically in double by both engines (the
        # lit_cb_q2 precedent); i_item_id is the lone group key, so
        # ORDER BY + LIMIT 100 is total.
        return run_literal_sql(spark, sf_dir, "tpcds", "q7").toDF(
            *_PROMO_AVG_COLS
        )

    @query(
        "lit_tpcds_q26_promo_catalog_avgs",
        oracle=_tpcds_oracle(
            "q26",
            ("catalog_sales", "customer_demographics", "date_dim", "item",
             "promotion"),
            _PROMO_AVG_COLS,
        ),
        tags=("literal", "tpcds", "star-join", "avg"),
        order_by="i_item_id",
    )
    def lit_tpcds_q26(spark: SparkSession, sf_dir: str) -> DataFrame:
        # q7's catalog-channel twin (cs_bill_cdemo_sk path) — same exactness
        # argument.
        return run_literal_sql(spark, sf_dir, "tpcds", "q26").toDF(
            *_PROMO_AVG_COLS
        )

    @query(
        "lit_tpcds_q90_ampm_ratio",
        oracle="SELECT CAST(am_pm_ratio AS DOUBLE) AS am_pm_ratio FROM ("
        + _tpcds_oracle(
            "q90",
            ("web_sales", "household_demographics", "time_dim", "web_page"),
            ("am_pm_ratio",),
        )
        + ")",
        tags=("literal", "tpcds", "ratio"),
    )
    def lit_tpcds_q90(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Verbatim q90: morning/evening web-traffic count ratio. The text
        # divides two exact counts as DECIMAL(15,4); Spark keeps a decimal
        # quotient (35,20) while DuckDB's decimal division yields DOUBLE —
        # both sides are cast to DOUBLE for a type-stable compare (the
        # 20-fractional-digit decimal carries more precision than the
        # double it rounds into).
        return run_literal_sql(spark, sf_dir, "tpcds", "q90").selectExpr(
            "CAST(am_pm_ratio AS DOUBLE) AS am_pm_ratio"
        )


_TPCH_Q13_ORACLE = f"""
WITH {_lit_ctes("customer", "orders")}
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM lit_customer LEFT OUTER JOIN lit_orders
    ON c_custkey = o_custkey AND o_comment NOT LIKE '%special%requests%'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@query(
    "lit_tpch_q13_custdist",
    oracle=_TPCH_Q13_ORACLE,
    tags=("literal", "tpch", "outer-join", "count"),
    order_by="custdist DESC, c_count DESC",
)
def lit_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Verbatim q13 (no dates, so no shift): per-customer order counts
    # through a LEFT OUTER anti-LIKE join, then the count distribution —
    # all integers, no LIMIT, multiset-deterministic.
    return run_literal_sql(spark, sf_dir, "tpch", "q13").toDF(
        "c_count", "custdist"
    )


_CB_Q4_ORACLE = f"""
WITH {_lit_ctes("hits")}
SELECT COUNT(DISTINCT "UserID") AS n_users FROM lit_hits
"""


@query(
    "lit_cb_q4_distinct_users",
    oracle=_CB_Q4_ORACLE,
    tags=("literal", "clickbench", "distinct"),
)
def lit_cb_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_literal_sql(spark, sf_dir, "clickbench", "q4").toDF("n_users")


_CB_Q7_ORACLE = f"""
WITH {_lit_ctes("hits")}
SELECT "AdvEngineID" AS adv_engine, COUNT(*) AS c
FROM lit_hits WHERE "AdvEngineID" <> 0
GROUP BY "AdvEngineID" ORDER BY c DESC
"""


@query(
    "lit_cb_q7_adv_engine_counts",
    # No order_by declaration: the text's ORDER BY c DESC has count ties,
    # so the order is not total — compared as a multiset.
    oracle=_CB_Q7_ORACLE,
    tags=("literal", "clickbench", "count"),
)
def lit_cb_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Verbatim q7: per-engine counts, NO LIMIT — the count-descending order
    # has ties but the driver compare is a multiset, so it's deterministic.
    return run_literal_sql(spark, sf_dir, "clickbench", "q7").toDF(
        "adv_engine", "c"
    )


_CB_Q20_ORACLE = f"""
WITH {_lit_ctes("hits")}
SELECT COUNT(*) AS n_google FROM lit_hits WHERE "URL" LIKE '%google%'
"""


@query(
    "lit_cb_q20_url_like_count",
    oracle=_CB_Q20_ORACLE,
    tags=("literal", "clickbench", "count", "like"),
)
def lit_cb_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_literal_sql(spark, sf_dir, "clickbench", "q20").toDF("n_google")


# ---------------------------------------------------------------------------
# Round-9 promotions (r8 VERDICT item 6): five more integer-exact verbatim
# texts behind the bit-exact gate. ClickBench q9 was evaluated and REJECTED:
# its ORDER BY c DESC LIMIT 10 cut has count TIES at the rank-10 boundary at
# both sf0.01 (...143,141,141...) and sf0.1 (...614,613,612 but 9/10 tie
# deeper) — not deterministic across engines. q10/q13 are safe because their
# group counts are VOCABULARY-bounded below the LIMIT (7 phone models, 10
# search phrases — generated vocabularies, scale-invariant), so the LIMIT
# never cuts and the driver's multiset compare is total.
# ---------------------------------------------------------------------------

_CB_Q10_ORACLE = f"""
WITH {_lit_ctes("hits")}
SELECT "MobilePhoneModel" AS phone_model, COUNT(DISTINCT "UserID") AS u
FROM lit_hits WHERE "MobilePhoneModel" <> ''
GROUP BY "MobilePhoneModel" ORDER BY u DESC LIMIT 10
"""


@query(
    "lit_cb_q10_phone_model_users",
    oracle=_CB_Q10_ORACLE,
    tags=("literal", "clickbench", "distinct", "count"),
)
def lit_cb_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Verbatim q10: distinct users per phone model. 7 non-empty models at
    # any SF (bounded vocabulary) < LIMIT 10, so the cut never drops a row.
    return run_literal_sql(spark, sf_dir, "clickbench", "q10").toDF(
        "phone_model", "u"
    )


_CB_Q13_ORACLE = f"""
WITH {_lit_ctes("hits")}
SELECT "SearchPhrase" AS phrase, COUNT(DISTINCT "UserID") AS u
FROM lit_hits WHERE "SearchPhrase" <> ''
GROUP BY "SearchPhrase" ORDER BY u DESC LIMIT 10
"""


@query(
    "lit_cb_q13_search_phrase_users",
    oracle=_CB_Q13_ORACLE,
    tags=("literal", "clickbench", "distinct", "count"),
)
def lit_cb_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Verbatim q13: exactly 10 non-empty search phrases at any SF (bounded
    # vocabulary) == LIMIT 10 — every group survives, multiset-total.
    return run_literal_sql(spark, sf_dir, "clickbench", "q13").toDF(
        "phrase", "u"
    )


_TPCH_Q16_ORACLE = f"""
WITH {_lit_ctes("part", "partsupp", "supplier")}
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM lit_partsupp, lit_part
WHERE p_partkey = ps_partkey
  AND p_brand <> 'Brand#45'
  AND p_type NOT LIKE 'MEDIUM POLISHED%'
  AND p_size IN (49, 14, 23, 45, 19, 3, 36, 9)
  AND ps_suppkey NOT IN (
    SELECT s_suppkey FROM lit_supplier
    WHERE s_comment LIKE '%Customer%Complaints%')
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@query(
    "lit_tpch_q16_supplier_cnt",
    oracle=_TPCH_Q16_ORACLE,
    tags=("literal", "tpch", "distinct", "count", "not-in"),
    order_by="supplier_cnt DESC, p_brand, p_type, p_size",
)
def lit_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Verbatim q16 (no dates): COUNT DISTINCT through a NOT-IN subquery,
    # fully ordered by the group key — deterministic, all integers/strings.
    return run_literal_sql(spark, sf_dir, "tpch", "q16").toDF(
        "p_brand", "p_type", "p_size", "supplier_cnt"
    )


if _os.path.isdir(REFERENCE_QUERIES):

    @query(
        "lit_tpcds_q15_zip_quarter_sales",
        oracle=_tpcds_oracle(
            "q15",
            ("catalog_sales", "customer", "customer_address", "date_dim"),
            ("ca_zip", "sum_sales"),
            year_shift=-3,
        ),
        tags=("literal", "tpcds", "star-join"),
        order_by="ca_zip",
    )
    def lit_tpcds_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Verbatim q15 under the -3 year shift (d_year=2001 predates the
        # 1992-1998 order range; 1998 Q2 is in range). sum(cs_sales_price)
        # over integer-valued doubles is order-exact; the 10 zip groups
        # (bounded vocabulary) are fully ordered and below the LIMIT.
        return run_literal_sql(
            spark, sf_dir, "tpcds", "q15", year_shift=-3
        ).toDF("ca_zip", "sum_sales")

    @query(
        "lit_tpcds_q32_excess_discount_catalog",
        oracle=_tpcds_oracle(
            "q32",
            ("catalog_sales", "item", "date_dim"),
            ("excess_discount",),
            date_shift_years=-3,
        ),
        tags=("literal", "tpcds", "correlated-subquery"),
    )
    def lit_tpcds_q32(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Verbatim q32 (q92's catalog sibling) with its DATE literals
        # shifted -3y into range: one SUM of integer-valued doubles above a
        # correlated 1.3*avg threshold — avg is one exact-sum/count
        # division, the single multiply is bit-identical in both engines.
        return run_literal_sql(
            spark, sf_dir, "tpcds", "q32", date_shift_years=-3
        ).toDF("excess_discount")

    # -----------------------------------------------------------------------
    # Round-9 second wave (r8 VERDICT item 6 continued): four more
    # integer-exact verbatim texts. TPC-DS q37 was evaluated and REJECTED:
    # its selection is empty at sf0.01, the driver gate's scale (populates
    # only at sf0.1 — 9 rows) — an empty gate entry proves nothing. TPC-H q2
    # likewise REJECTED: empty at both gate scales (the p_size=15 AND
    # p_type LIKE '%BRASS' conjunction misses the synthetic part mix).
    # -----------------------------------------------------------------------

    _Q21_COLS = ("w_warehouse_name", "i_item_id", "inv_before", "inv_after")

    @query(
        "lit_tpcds_q21_inventory_shift_bands",
        oracle=_tpcds_oracle(
            "q21",
            ("inventory", "warehouse", "item", "date_dim"),
            _Q21_COLS,
        ),
        tags=("literal", "tpcds", "inventory", "conditional-agg"),
        order_by="w_warehouse_name, i_item_id",
    )
    def lit_tpcds_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Verbatim q21: before/after pivot-date inventory sums (INT sums —
        # exact), filtered on a decimal ratio band whose boundary both
        # engines evaluate from the identical text over identical integer
        # sums (agreement value-proven in the pytest lane at sf0.01, and
        # the gate data is fixed). ORDER BY is the full group key, so the
        # LIMIT 100 cut at sf0.1 is a total-order prefix.
        return run_literal_sql(spark, sf_dir, "tpcds", "q21").toDF(*_Q21_COLS)

    _Q40_COLS = ("w_state", "i_item_id", "sales_before", "sales_after")

    @query(
        "lit_tpcds_q40_returns_net_bands",
        oracle=_tpcds_oracle(
            "q40",
            ("catalog_sales", "catalog_returns", "warehouse", "item",
             "date_dim"),
            _Q40_COLS,
        ),
        tags=("literal", "tpcds", "outer-join", "conditional-agg"),
        order_by="w_state, i_item_id",
    )
    def lit_tpcds_q40(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Verbatim q40: catalog sales net of returns (LEFT OUTER on
        # (order, item)) split at the pivot date. cs_sales_price and
        # cr_refunded_cash are integer-valued doubles, so the differences
        # and sums are order-exact; ORDER BY is the full group key.
        return run_literal_sql(spark, sf_dir, "tpcds", "q40").toDF(*_Q40_COLS)

    _Q82_COLS = ("i_item_id", "i_item_desc", "i_current_price")

    @query(
        "lit_tpcds_q82_inventory_band_items",
        oracle=_tpcds_oracle(
            "q82",
            ("item", "inventory", "date_dim", "store_sales"),
            _Q82_COLS,
        ),
        tags=("literal", "tpcds", "inventory", "semi-join"),
        order_by="i_item_id",
    )
    def lit_tpcds_q82(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Verbatim q82: items in a price/manufacturer band with in-stock
        # inventory and store sales. GROUP-KEYS-ONLY output (no aggregate
        # columns): strings plus i_current_price, an exact two-decimal
        # double computed from the same integer expression in both engines.
        # i_item_id determines the other two columns, so ORDER BY i_item_id
        # is total.
        return run_literal_sql(spark, sf_dir, "tpcds", "q82").toDF(*_Q82_COLS)


_TPCH_Q21_ORACLE = f"""
WITH {_lit_ctes("supplier", "lineitem", "orders", "nation")}
SELECT s_name, count(*) AS numwait
FROM lit_supplier, lit_lineitem l1, lit_orders, lit_nation
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_receiptdate > l1.l_commitdate
  AND EXISTS (SELECT * FROM lit_lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT * FROM lit_lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_receiptdate > l3.l_commitdate)
  AND s_nationkey = n_nationkey
  AND n_name = 'SAUDI ARABIA'
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


@query(
    "lit_tpch_q21_waiting_suppliers",
    oracle=_TPCH_Q21_ORACLE,
    tags=("literal", "tpch", "exists", "anti-join", "count"),
    order_by="numwait DESC, s_name",
)
def lit_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Verbatim q21 (no dates, no LIMIT): suppliers who were the sole late
    # supplier on a finalized multi-supplier order — EXISTS + NOT EXISTS
    # over lineitem, COUNT(*) groups. All integers/strings; s_name is
    # unique, so the declared order is total.
    return run_literal_sql(spark, sf_dir, "tpch", "q21").toDF(
        "s_name", "numwait"
    )


# ---------------------------------------------------------------------------
# Round-9 third wave: eleven more integer-exact verbatim texts. Selection
# rule unchanged — outputs are counts, integer-valued-double sums (exact at
# any partition order), group keys, or deterministic double divisions of
# exact integers; every LIMIT cut happens under a TOTAL order (unique key in
# the ORDER BY) or is never reached (row count / bounded vocabulary below
# the LIMIT at both gate scales). TPC-DS q6 was evaluated and REJECTED: its
# avg(i_current_price)*1.2 subquery averages NON-integer-valued two-decimal
# doubles, whose sum is partition-order-sensitive in Spark — a knife-edge
# the bit-exact gate must not sit on.
# ---------------------------------------------------------------------------

if _os.path.isdir(REFERENCE_QUERIES):

    _Q4_COLS = ("customer_id", "customer_first_name", "customer_last_name",
                "customer_preferred_cust_flag")

    @query(
        "lit_tpcds_q4_three_channel_growth",
        oracle=_tpcds_oracle(
            "q4",
            ("store_sales", "catalog_sales", "web_sales", "customer",
             "date_dim"),
            _Q4_COLS,
            year_shift=-1,
        ),
        tags=("literal", "tpcds", "self-join", "growth-ratio"),
        order_by="customer_id",
    )
    def lit_tpcds_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Verbatim q4 under the -1 year shift (2001/2002 predate the order
        # range): the 6-alias year_total self-join with growth-ratio-of-
        # ratios comparisons across all three channels. year_total sums
        # (... )/2 of integer-valued doubles — halves are binary-exact —
        # and the ratio compares divide exact doubles identically in both
        # engines. Output is strings; ORDER BY customer_id is unique, so
        # the sf0.1 LIMIT cut is a total-order prefix.
        return run_literal_sql(
            spark, sf_dir, "tpcds", "q4", year_shift=-1
        ).toDF(*_Q4_COLS)

    @query(
        "lit_tpcds_q8_preferred_zip_stores",
        oracle=_tpcds_oracle(
            "q8",
            ("store_sales", "date_dim", "store", "customer_address",
             "customer"),
            ("s_store_name", "sum_net_profit"),
        ),
        tags=("literal", "tpcds", "intersect", "zip-prefix"),
        order_by="s_store_name",
    )
    def lit_tpcds_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Verbatim q8: the zip-prefix INTERSECT machinery (400-literal
        # IN-list x preferred-customer zips, then substr-2 store match).
        # sum(ss_net_profit) is exact; store names are a 10-value bounded
        # vocabulary, so the LIMIT never cuts.
        return run_literal_sql(spark, sf_dir, "tpcds", "q8").toDF(
            "s_store_name", "sum_net_profit"
        )

    _Q25_COLS = ("i_item_id", "i_item_desc", "s_store_id", "s_store_name",
                 "store_sales_profit", "store_returns_loss",
                 "catalog_sales_profit")

    @query(
        "lit_tpcds_q25_buy_return_rebuy_profit",
        oracle=_tpcds_oracle(
            "q25",
            ("store_sales", "store_returns", "catalog_sales", "date_dim",
             "store", "item"),
            _Q25_COLS,
        ),
        tags=("literal", "tpcds", "chain-join"),
        order_by="i_item_id, i_item_desc, s_store_id, s_store_name",
    )
    def lit_tpcds_q25(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Verbatim q25: the buy->return->rebuy same-customer-same-item
        # chain (store sale, store return, catalog re-purchase) with
        # exact net_profit/net_loss sums; ORDER BY is the full group key.
        return run_literal_sql(spark, sf_dir, "tpcds", "q25").toDF(*_Q25_COLS)

    _Q29_COLS = ("i_item_id", "i_item_desc", "s_store_id", "s_store_name",
                 "store_sales_quantity", "store_returns_quantity",
                 "catalog_sales_quantity")

    @query(
        "lit_tpcds_q29_buy_return_rebuy_quantity",
        oracle=_tpcds_oracle(
            "q29",
            ("store_sales", "store_returns", "catalog_sales", "date_dim",
             "store", "item"),
            _Q29_COLS,
        ),
        tags=("literal", "tpcds", "chain-join"),
        order_by="i_item_id, i_item_desc, s_store_id, s_store_name",
    )
    def lit_tpcds_q29(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Verbatim q29: q25's INT-quantity sibling over a wider month
        # window; all-integer outputs, full-group-key ordering.
        return run_literal_sql(spark, sf_dir, "tpcds", "q29").toDF(*_Q29_COLS)

    @query(
        "lit_tpcds_q33_manufact_period_sales",
        oracle=_tpcds_oracle(
            "q33",
            ("store_sales", "catalog_sales", "web_sales", "date_dim",
             "customer_address", "item"),
            ("i_manufact_id", "total_sales"),
        ),
        tags=("literal", "tpcds", "union", "in-subquery"),
    )
    def lit_tpcds_q33(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Verbatim q33: three-channel UNION under an IN-subquery manufact
        # restriction. total_sales sums integer-valued ext_sales_price
        # (exact); 90 groups at sf0.1 < LIMIT 100, so the count-tied ORDER
        # never cuts and the compare is a multiset.
        return run_literal_sql(spark, sf_dir, "tpcds", "q33").toDF(
            "i_manufact_id", "total_sales"
        )

    @query(
        "lit_tpcds_q56_color_period_sales",
        oracle=_tpcds_oracle(
            "q56",
            ("store_sales", "catalog_sales", "web_sales", "date_dim",
             "customer_address", "item"),
            ("i_item_id", "total_sales"),
        ),
        tags=("literal", "tpcds", "union", "in-subquery"),
    )
    def lit_tpcds_q56(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Verbatim q56: q33's color-restricted sibling; 79 groups at sf0.1
        # < LIMIT 100 — no cut, multiset-total.
        return run_literal_sql(spark, sf_dir, "tpcds", "q56").toDF(
            "i_item_id", "total_sales"
        )

    _Q58_COLS = ("item_id", "ss_item_rev", "ss_dev", "cs_item_rev",
                 "cs_dev", "ws_item_rev", "ws_dev", "average")

    @query(
        "lit_tpcds_q58_cross_channel_parity",
        oracle=_tpcds_oracle(
            "q58",
            ("store_sales", "catalog_sales", "web_sales", "date_dim",
             "item"),
            _Q58_COLS,
        ),
        tags=("literal", "tpcds", "scalar-subquery", "band-compare"),
        order_by="item_id, ss_item_rev",
    )
    def lit_tpcds_q58(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Verbatim q58: items whose one-day revenue agrees within 10%
        # across all three channels. Each rev is an exact sum; the 0.9/1.1
        # band products and the dev/average divisions are single IEEE ops
        # on exact doubles — bit-identical. ORDER BY leads with the unique
        # item_id, so the sf0.1 LIMIT cut is total-ordered.
        return run_literal_sql(spark, sf_dir, "tpcds", "q58").toDF(*_Q58_COLS)

    @query(
        "lit_tpcds_q60_category_period_sales",
        oracle=_tpcds_oracle(
            "q60",
            ("store_sales", "catalog_sales", "web_sales", "date_dim",
             "customer_address", "item"),
            ("i_item_id", "total_sales"),
        ),
        tags=("literal", "tpcds", "union", "in-subquery"),
        order_by="i_item_id, total_sales",
    )
    def lit_tpcds_q60(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Verbatim q60: q33's category-restricted sibling. ORDER BY leads
        # with the unique group key i_item_id, so the LIMIT cut at sf0.1
        # (exactly 100 groups) is a total-order prefix.
        return run_literal_sql(spark, sf_dir, "tpcds", "q60").toDF(
            "i_item_id", "total_sales"
        )

    _Q71_COLS = ("brand_id", "brand", "t_hour", "t_minute", "ext_price")

    @query(
        "lit_tpcds_q71_brand_time_of_day",
        oracle=_tpcds_oracle(
            "q71",
            ("item", "web_sales", "catalog_sales", "store_sales",
             "date_dim", "time_dim"),
            _Q71_COLS,
        ),
        tags=("literal", "tpcds", "union", "time-dim"),
    )
    def lit_tpcds_q71(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Verbatim q71: three-channel UNION joined to time_dim's meal-time
        # slices, grouped by brand x minute. Exact integer-valued sums, NO
        # LIMIT — multiset-deterministic despite ext_price ordering ties.
        return run_literal_sql(spark, sf_dir, "tpcds", "q71").toDF(*_Q71_COLS)

    @query(
        "lit_tpcds_q93_net_after_returns",
        oracle=_tpcds_oracle(
            "q93",
            ("store_sales", "store_returns", "reason"),
            ("ss_customer_sk", "sumsales"),
        ),
        tags=("literal", "tpcds", "outer-join"),
        order_by="sumsales, ss_customer_sk",
    )
    def lit_tpcds_q93(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Verbatim q93: per-customer sales net of reason-28 returns
        # (LEFT OUTER on (item, ticket)). act_sales multiplies integer
        # quantities by integer-valued sales_price — exact products, exact
        # sums; ss_customer_sk breaks sumsales ties, so the LIMIT cut
        # (exactly 100 at both scales) is total-ordered.
        return run_literal_sql(spark, sf_dir, "tpcds", "q93").toDF(
            "ss_customer_sk", "sumsales"
        )


_TPCH_Q18_ORACLE = f"""
WITH {_lit_ctes("customer", "orders", "lineitem")}
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       sum(l_quantity) AS total_qty
FROM lit_customer, lit_orders, lit_lineitem
WHERE o_orderkey IN (SELECT l_orderkey FROM lit_lineitem
                     GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
  AND c_custkey = o_custkey
  AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate
"""


@query(
    "lit_tpch_q18_large_volume_customers",
    oracle=_TPCH_Q18_ORACLE,
    tags=("literal", "tpch", "in-subquery", "having"),
)
def lit_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Verbatim q18 (no dates, no LIMIT in the reference text): orders whose
    # total quantity exceeds 300 through an IN-subquery HAVING. l_quantity
    # is an integer-valued double (sums exact); o_totalprice is a raw
    # pass-through column — multiset-deterministic.
    return run_literal_sql(spark, sf_dir, "tpch", "q18").toDF(
        "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
        "total_qty"
    )
