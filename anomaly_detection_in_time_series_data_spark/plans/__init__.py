"""Physical-plan introspection helpers (SURVEY.md §4).

The engine's optimizer is Catalyst; our job is to *verify* the plans it
produces are the ones we want at scale — filters reaching the parquet scan,
small dims broadcast, top-k as TakeOrderedAndProject, wide codegen spans —
and to fail tests when a code change regresses them.
"""

from .inspect import (
    executed_plan,
    formatted_plan,
    grouped_global_windows,
    has_broadcast_join,
    has_partition_filter,
    has_pushed_filter,
    has_take_ordered,
    partitioned_subgrain_windows,
    read_columns,
    unbounded_global_windows,
    whole_stage_codegen_spans,
)

__all__ = [
    "executed_plan",
    "formatted_plan",
    "grouped_global_windows",
    "has_broadcast_join",
    "has_partition_filter",
    "has_pushed_filter",
    "has_take_ordered",
    "partitioned_subgrain_windows",
    "read_columns",
    "unbounded_global_windows",
    "whole_stage_codegen_spans",
]
