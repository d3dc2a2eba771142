from .explain import assert_plan, has_broadcast_join, physical_plan, pushed_filters

__all__ = ["assert_plan", "has_broadcast_join", "physical_plan", "pushed_filters"]
