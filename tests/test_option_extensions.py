"""Typed config-extension propagation — the repo analogue of the
reference's ConfigExtension flow
(/root/reference/docs/source/advanced/02-config-extensions.md, exercised by
tests/worker_plan_hook.rs's PlanHookOptions): a typed struct set on the
coordinating session must be readable, with types and defaults intact,
inside every task — including tasks of post-shuffle stages (the
worker-to-worker hop) — and inside worker plan rewrite hooks."""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
import pytest

from datafusion_distributed_spark.plans.options import (
    NAMESPACE,
    OptionExtension,
    clear_option_extension,
    get_option_extension,
    set_option_extension,
)
from datafusion_distributed_spark.tables import load_tables

from .conftest import SF_DIR


@dataclass
class CustomExtension(OptionExtension):
    """Mirror of the doc's CustomExtension { foo: String, bar: usize }."""

    PREFIX = "custom"
    foo: str = ""
    bar: int = 0
    ratio: float = 0.5
    fail_fast: bool = False


def test_driver_round_trip_and_defaults(spark):
    ext = CustomExtension(foo="hello", bar=7, ratio=1.25, fail_fast=True)
    set_option_extension(spark, ext)
    try:
        got = get_option_extension(CustomExtension, spark)
        assert got == ext
    finally:
        clear_option_extension(spark, CustomExtension)
    # after clearing, defaults come back (extensions_options! default
    # semantics)
    assert get_option_extension(CustomExtension, spark) == CustomExtension()


def test_extension_reaches_tasks_across_shuffle(spark):
    """The worker side of the wire: rebuild the typed struct INSIDE tasks of
    a post-shuffle stage — the analogue of a worker rebuilding the extension
    from incoming metadata and it flowing across worker-to-worker hops."""
    set_option_extension(spark, CustomExtension(foo="tenant-9", bar=42))
    try:
        orders = load_tables(spark, SF_DIR)["orders"]
        agg = orders.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n")
        )

        def read_ext(_it):
            ext = get_option_extension(CustomExtension)
            yield (ext.foo, ext.bar, ext.ratio, ext.fail_fast)

        seen = set(agg.rdd.mapPartitions(read_ext).collect())
        assert seen == {("tenant-9", 42, 0.5, False)}
    finally:
        clear_option_extension(spark, CustomExtension)


def test_hook_reads_option_extension(spark):
    """Mirror of the reference hook test: the handler reads its typed
    options (propagated request config), not hardcoded values."""
    from datafusion_distributed_spark.operators.relational import tpch_q6
    from datafusion_distributed_spark.plans.hooks import (
        clear_worker_plan_hooks,
        register_worker_plan_hook,
        run_plan_hooks,
    )

    seen = []
    set_option_extension(spark, CustomExtension(foo="worker-session-value"))
    try:

        def hook(df, ctx):
            seen.append(ctx.option_extension(CustomExtension).foo)
            return df

        register_worker_plan_hook("read-options", hook)
        run_plan_hooks(tpch_q6(spark, SF_DIR))
        assert seen == ["worker-session-value"]
    finally:
        clear_worker_plan_hooks()
        clear_option_extension(spark, CustomExtension)


def test_reserved_namespace_and_validation(spark):
    assert NAMESPACE.endswith(".")

    @dataclass
    class NoPrefix(OptionExtension):
        x: int = 1

    with pytest.raises(ValueError, match="non-empty PREFIX"):
        set_option_extension(spark, NoPrefix())

    class NotADataclass(OptionExtension):
        PREFIX = "nd"

    with pytest.raises(TypeError, match="dataclass"):
        set_option_extension(spark, NotADataclass())

    with pytest.raises(ValueError, match="needs `spark`"):
        get_option_extension(CustomExtension)


def test_parse_round_trip_property():
    """String round-trip totality: every value an extension field can hold
    must survive str() -> _parse() exactly (the reference's
    extensions_options! guarantees the same round-trip through gRPC
    metadata strings)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from datafusion_distributed_spark.plans.options import _parse

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
    def ints(v):
        assert _parse(str(v), int, None) == v

    @settings(max_examples=200, deadline=None)
    @given(st.floats(allow_nan=False))
    def floats(v):
        assert _parse(str(v), float, None) == v

    @settings(max_examples=100, deadline=None)
    @given(st.booleans())
    def bools(v):
        assert _parse(str(v), bool, None) == v

    @settings(max_examples=200, deadline=None)
    @given(st.text())
    def strs(v):
        assert _parse(v, str, None) == v

    ints()
    floats()
    bools()
    strs()
    # None (property unset) falls back to the declared default for every type
    for typ, default in ((int, 3), (float, 0.5), (bool, True), (str, "d")):
        assert _parse(None, typ, default) == default


def test_defaultless_field_raises_descriptive_error(spark):
    """A field with neither default nor default_factory is a contract
    violation (unset properties must be able to fall back); the error names
    the field instead of the opaque '_MISSING_TYPE is not callable' (r8
    ADVICE)."""
    import dataclasses

    import pytest

    from datafusion_distributed_spark.plans.options import (
        OptionExtension,
        get_option_extension,
        set_option_extension,
    )

    @dataclasses.dataclass
    class Bad(OptionExtension):
        PREFIX = "bad"
        no_default: int

    with pytest.raises(ValueError, match="Bad.no_default has no default"):
        get_option_extension(Bad, spark)
    with pytest.raises(ValueError, match="Bad.no_default has no default"):
        set_option_extension(spark, Bad(no_default=1))
