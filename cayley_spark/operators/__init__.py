"""Standalone relational operators (no reference analog): temporal
joins and skew mitigation."""

from .joins import asof_join, range_join
from .skew import salted_count, salted_join

__all__ = ["asof_join", "range_join", "salted_count", "salted_join"]
