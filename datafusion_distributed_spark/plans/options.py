"""Typed config extensions propagated to every task — the analogue of the
reference's ConfigExtension propagation
(/root/reference/docs/source/advanced/02-config-extensions.md).

The reference declares a typed options struct (``extensions_options!``,
string round-trip included), registers it with
``with_distributed_option_extension`` — which serializes it into gRPC
metadata under the reserved ``x-datafusion-distributed-config-<prefix>``
namespace and ships it with every Arrow-Flight request — and each worker
rebuilds it from headers with
``with_distributed_option_extension_from_headers``, re-marking it so it
keeps flowing across worker-to-worker hops.

Spark's channel for exactly this contract is driver LOCAL PROPERTIES: they
ride with every task an action spawns, across shuffle (worker-to-worker)
hops, and are readable inside tasks via ``TaskContext.getLocalProperty``
(proven in tests/test_context_propagation.py). This module supplies the
typed layer on top:

- declare a ``@dataclass`` subclassing :class:`OptionExtension` with a
  ``PREFIX``;
- :func:`set_option_extension` serializes each field as a string local
  property under the reserved ``spark.graft.config.<prefix>.`` namespace
  (the analogue of the reserved gRPC metadata namespace — keep passthrough
  properties out of it, as the reference doc mandates for its namespace);
- :func:`get_option_extension` rebuilds the typed struct ANYWHERE — on the
  driver, inside a task, or inside a worker plan rewrite hook
  (plans/hooks.py ``HookContext.option_extension``) — handling the
  string→bool/int/float/str round-trip and falling back to the dataclass
  defaults for unset fields, exactly like ``extensions_options!`` defaults.
"""

from __future__ import annotations

import dataclasses
import typing
from typing import Optional, Type, TypeVar

from pyspark import TaskContext
from pyspark.sql import SparkSession

#: Reserved local-property namespace — the analogue of the reference's
#: ``x-datafusion-distributed-config-`` gRPC metadata prefix.
NAMESPACE = "spark.graft.config."

E = TypeVar("E", bound="OptionExtension")


class OptionExtension:
    """Mixin for ``@dataclass`` option-extension structs. Subclasses set
    ``PREFIX`` (the reference's ``ConfigExtension::PREFIX``) and declare
    typed fields with defaults."""

    PREFIX: typing.ClassVar[str] = ""


def _fields(cls: Type[E]):
    if not dataclasses.is_dataclass(cls):
        raise TypeError(f"{cls.__name__} must be a dataclass")
    if not getattr(cls, "PREFIX", ""):
        raise ValueError(f"{cls.__name__} must define a non-empty PREFIX")
    hints = typing.get_type_hints(cls)
    for f in dataclasses.fields(cls):
        if (
            f.default is dataclasses.MISSING
            and f.default_factory is dataclasses.MISSING  # type: ignore[misc]
        ):
            # Caught here (not at f.default_factory() call time) so the
            # contract error names the offending field instead of an opaque
            # "'_MISSING_TYPE' object is not callable" (r8 ADVICE).
            raise ValueError(
                f"{cls.__name__}.{f.name} has no default: option-extension "
                "fields must declare a default or default_factory — unset "
                "properties fall back to it (the reference's "
                "extensions_options! defaults)"
            )
    return [(f.name, hints.get(f.name, str)) for f in dataclasses.fields(cls)]


def set_option_extension(spark: SparkSession, ext: OptionExtension) -> None:
    """Serialize every field of ``ext`` into the reserved local-property
    namespace; subsequent actions carry them to every task."""
    sc = spark.sparkContext
    for name, _typ in _fields(type(ext)):
        sc.setLocalProperty(
            f"{NAMESPACE}{ext.PREFIX}.{name}", str(getattr(ext, name))
        )


def clear_option_extension(spark: SparkSession, cls: Type[E]) -> None:
    sc = spark.sparkContext
    for name, _typ in _fields(cls):
        sc.setLocalProperty(f"{NAMESPACE}{cls.PREFIX}.{name}", None)


def _parse(raw: Optional[str], typ, default):
    if raw is None:
        return default
    if typ is bool:
        return raw.strip().lower() in ("true", "1", "yes")
    if typ is int:
        return int(raw)
    if typ is float:
        return float(raw)
    return raw


def get_option_extension(
    cls: Type[E], spark: Optional[SparkSession] = None
) -> E:
    """Rebuild the typed struct from propagated properties. Inside a task,
    reads from :class:`TaskContext` (the worker side of the wire); on the
    driver, from the SparkContext (``spark`` required there). Unset fields
    keep their dataclass defaults."""
    tc = TaskContext.get()
    if tc is not None:
        getter = tc.getLocalProperty
    else:
        if spark is None:
            raise ValueError(
                "get_option_extension needs `spark` outside a task context"
            )
        getter = spark.sparkContext.getLocalProperty
    _fields(cls)  # validates: dataclass, PREFIX, every field has a default
    kwargs = {}
    for f in dataclasses.fields(cls):
        typ = typing.get_type_hints(cls).get(f.name, str)
        default = (
            f.default
            if f.default is not dataclasses.MISSING
            else f.default_factory()  # type: ignore[misc]
        )
        raw = getter(f"{NAMESPACE}{cls.PREFIX}.{f.name}")
        kwargs[f.name] = _parse(raw, typ, default)
    return cls(**kwargs)
