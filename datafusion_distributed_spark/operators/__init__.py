"""Operator surface (SURVEY.md §2): relational, analytic, clickstream,
dedup, text stats, similarity, multimodal. Import the registry to enumerate."""

from .registry import REGISTRY, all_oracles, all_queries, query

__all__ = ["REGISTRY", "all_oracles", "all_queries", "query"]
