from .windows import session_agg, sliding_agg, tumbling_agg

__all__ = ["session_agg", "sliding_agg", "tumbling_agg"]
