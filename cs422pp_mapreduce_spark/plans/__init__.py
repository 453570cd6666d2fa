from .explain import explain_str, count_shuffles, has_broadcast_join, pushed_filters

__all__ = ["explain_str", "count_shuffles", "has_broadcast_join", "pushed_filters"]
