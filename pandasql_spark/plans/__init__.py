"""Physical-plan introspection helpers (plan-quality guardrails)."""

from .explain import (
    broadcast_join_count,
    explain_str,
    operator_names,
    pushed_filters,
    read_schemas,
    shuffle_count,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "read_schemas",
    "broadcast_join_count",
    "shuffle_count",
    "operator_names",
]
