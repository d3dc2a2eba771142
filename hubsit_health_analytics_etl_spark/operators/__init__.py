from .aggregate import avg_if, count_if, sum_if
from .joins import anti_join, lookup_join, unmatched_report
from .profile import quality_profile
from .reshape import percent_of_total, pivot_counts, profile_union, top_k, unpivot

__all__ = [
    "avg_if",
    "count_if",
    "sum_if",
    "anti_join",
    "lookup_join",
    "unmatched_report",
    "quality_profile",
    "percent_of_total",
    "pivot_counts",
    "profile_union",
    "top_k",
    "unpivot",
]
