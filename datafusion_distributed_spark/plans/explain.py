"""Reference-style stage-tree EXPLAIN over Spark physical plans.

The reference renders its distributed plan as an ASCII stage tree with
per-stage task/partition annotations (display_plan_ascii,
/root/reference/src/stage.rs; example output at
/root/reference/src/distributed_planner/distributed_query_planner.rs:225-244).
In Spark the equivalent boundaries are Exchange operators (shuffle/broadcast),
so we walk the executed plan string and cut stages at Exchange nodes —
exactly the mapping of SURVEY.md §0 terminology (network boundary == Exchange).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

_BOUNDARY_MARKERS = ("Exchange", "BroadcastExchange", "ShuffleQueryStage", "BroadcastQueryStage")


@dataclass
class Stage:
    stage_id: int
    kind: str  # "head" | "shuffle" | "broadcast"
    nodes: list[str] = field(default_factory=list)
    children: list["Stage"] = field(default_factory=list)


def _physical_plan_lines(df: DataFrame) -> list[str]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return [ln for ln in plan.splitlines() if ln.strip()]


def _node_name(line: str) -> str:
    stripped = line.lstrip(" :+-*")
    # Strip whole-stage-codegen annotation "(N) "
    if stripped.startswith("(") and ")" in stripped[:6]:
        stripped = stripped.split(") ", 1)[-1]
    return stripped


def _indent(line: str) -> int:
    return len(line) - len(line.lstrip(" :+-*"))


def parse_stages(df: DataFrame) -> Stage:
    """Cut the physical plan into stages at Exchange boundaries."""
    lines = _physical_plan_lines(df)
    root = Stage(stage_id=0, kind="head")
    counter = [0]
    # stack of (indent, stage) — a deeper Exchange starts a child stage.
    stack: list[tuple[int, Stage]] = [(-1, root)]
    for line in lines:
        name = _node_name(line)
        ind = _indent(line)
        while len(stack) > 1 and ind <= stack[-1][0]:
            stack.pop()
        current = stack[-1][1]
        if any(name.startswith(m) for m in _BOUNDARY_MARKERS):
            counter[0] += 1
            kind = "broadcast" if "roadcast" in name.split("(")[0] else "shuffle"
            child = Stage(stage_id=counter[0], kind=kind)
            child.nodes.append(name)
            current.children.append(child)
            stack.append((ind, child))
        else:
            current.nodes.append(name)
    return root


def render_stage_tree(df: DataFrame) -> str:
    """ASCII stage tree in the reference's visual style."""
    root = parse_stages(df)
    out: list[str] = []

    def emit(stage: Stage, depth: int) -> None:
        pad = "  " * depth
        label = "Head Stage" if stage.stage_id == 0 else f"Stage {stage.stage_id}"
        out.append(f"{pad}┌───── {label} ({stage.kind})")
        for node in stage.nodes:
            out.append(f"{pad}│ {node}")
        out.append(f"{pad}└──────")
        for child in stage.children:
            emit(child, depth + 1)

    emit(root, 0)
    return "\n".join(out)


def stage_summary(df: DataFrame) -> dict:
    """Machine-readable stage statistics (for tests/metrics)."""
    root = parse_stages(df)
    n_stages = 0
    n_shuffles = 0
    n_broadcasts = 0

    def walk(s: Stage) -> None:
        nonlocal n_stages, n_shuffles, n_broadcasts
        n_stages += 1
        if s.kind == "shuffle":
            n_shuffles += 1
        elif s.kind == "broadcast":
            n_broadcasts += 1
        for c in s.children:
            walk(c)

    walk(root)
    return {
        "n_stages": n_stages,
        "n_shuffles": n_shuffles,
        "n_broadcasts": n_broadcasts,
    }
