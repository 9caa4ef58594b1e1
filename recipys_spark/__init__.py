"""recipys_spark — a PySpark-native declarative feature-engineering engine.

A from-scratch rebuild of the capabilities of rvandewater/ReciPys
(reference at /root/reference, surveyed in SURVEY.md): Recipe / Step /
Selector / role semantics, compiled to a lazy DAG of Spark DataFrame
transforms (Window specs, as-of joins, Arrow-vectorized UDFs) instead
of eager single-process Polars/Pandas calls.

Design stance (SURVEY.md §7):
- every transform is a lazy Spark expression; nothing executes until an
  action. Adjacent window functions share one canonical
  ``Window.partitionBy(groups).orderBy(sequence)`` spec so Catalyst
  collapses them into a single shuffle + sort.
- ``fit`` = explicit Spark aggregation jobs producing small frozen
  state collected to the driver (the train/apply leakage boundary).
- no per-row Python anywhere; ``applyInPandas`` / ``pandas_udf`` only
  where native expressions cannot express the semantics.
"""

from recipys_spark.ingredients import Ingredients
from recipys_spark.recipe import Recipe
from recipys_spark.selector import (
    Selector,
    all_of,
    all_groups,
    all_numeric_predictors,
    all_outcomes,
    all_predictors,
    all_sequences,
    contains,
    ends_with,
    has_role,
    has_type,
    regex_names,
    starts_with,
)
from recipys_spark.operators.base import Accumulator, Step

__all__ = [
    "Accumulator",
    "Ingredients",
    "Recipe",
    "Selector",
    "Step",
    "all_of",
    "all_groups",
    "all_numeric_predictors",
    "all_outcomes",
    "all_predictors",
    "all_sequences",
    "contains",
    "ends_with",
    "has_role",
    "has_type",
    "regex_names",
    "starts_with",
]

__version__ = "0.1.0"
