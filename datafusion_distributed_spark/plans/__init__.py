from .explain import render_stage_tree, stage_summary

__all__ = ["render_stage_tree", "stage_summary"]
