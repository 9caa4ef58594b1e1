"""Selector DSL: declarative column selection over schema + roles.

Port of the reference's ``Selector`` (reference recipys/selector.py:8–103)
onto Spark types. A ``Selector`` is a small pure-Python predicate object
resolved lazily at step-fit time against the *current*
``df.schema`` + roles map; selection intersects the four filters
(names ∩ roles ∩ types ∩ regex), preserving table column order
(selector.py:66–103, 157–175).

One deliberate divergence: the reference's ``all_numeric_predictors``
keys off backend-specific dtype-name lists that are mutually
inconsistent (selector.py:277–289, a quirk per SURVEY.md §2.4); ours
keys off Spark's type names, no backend parameter.
"""

from __future__ import annotations

import re
from typing import Optional, Union

from recipys_spark.ingredients import Ingredients

# Spark simple-string dtypes considered numeric for all_numeric_* selectors.
NUMERIC_TYPES = (
    "tinyint",
    "smallint",
    "int",
    "bigint",
    "float",
    "double",
)


def _as_list(x) -> Optional[list[str]]:
    if x is None:
        return None
    if isinstance(x, str):
        return [x]
    return list(x)


class Selector:
    """Resolves to an ordered list of column names at call time.

    Filters compose by intersection; ``None`` means "don't filter on
    this dimension". Order of the underlying table's columns is
    preserved; no dedup is needed because each filter yields a subset
    of the ordered column list.
    """

    def __init__(
        self,
        description: str = "",
        names: Union[str, list[str], None] = None,
        roles: Union[str, list[str], None] = None,
        types: Union[str, list[str], None] = None,
        pattern: Optional[Union[str, "re.Pattern"]] = None,
    ) -> None:
        self.description = description
        self.names = _as_list(names)
        self.roles = _as_list(roles)
        self.types = _as_list(types)
        self.pattern = re.compile(pattern) if isinstance(pattern, str) else pattern

    # mutators mirroring the reference's set_* API (selector.py:30–64)
    def set_names(self, names: Union[str, list[str]]) -> "Selector":
        self.names = _as_list(names)
        return self

    def set_roles(self, roles: Union[str, list[str]]) -> "Selector":
        self.roles = _as_list(roles)
        return self

    def set_types(self, types: Union[str, list[str]]) -> "Selector":
        self.types = _as_list(types)
        return self

    def set_pattern(self, pattern: Union[str, "re.Pattern"]) -> "Selector":
        self.pattern = re.compile(pattern) if isinstance(pattern, str) else pattern
        return self

    def __call__(self, ingredients: Ingredients) -> list[str]:
        if not isinstance(ingredients, Ingredients):
            raise TypeError(
                f"Selector expects Ingredients, got {type(ingredients).__name__}"
            )
        selected = list(ingredients.columns)
        if self.names is not None:
            want = set(self.names)
            missing = want - set(selected)
            if missing:
                raise ValueError(f"Selector names not in table: {sorted(missing)}")
            selected = [c for c in selected if c in want]
        if self.roles is not None:
            want = set(self.roles)
            roles = ingredients.roles
            selected = [c for c in selected if want & set(roles.get(c, []))]
        if self.types is not None:
            want = set(self.types)
            dtypes = ingredients.dtypes
            selected = [c for c in selected if _base_type(dtypes[c]) in want]
        if self.pattern is not None:
            selected = [c for c in selected if self.pattern.search(c)]
        return selected

    def __repr__(self) -> str:  # pragma: no cover
        return (
            f"Selector({self.description!r}, names={self.names}, roles={self.roles}, "
            f"types={self.types}, pattern={self.pattern})"
        )


def _base_type(dtype: str) -> str:
    """Normalize parametrized simple strings, e.g. decimal(10,2) → decimal."""
    return dtype.split("(", 1)[0]


# -- constructor library (reference selector.py:178–340) -----------------


def all_of(names: Union[str, list[str]]) -> Selector:
    return Selector(description=f"all of {names}", names=names)


def regex_names(pattern: str) -> Selector:
    return Selector(description=f"regex {pattern!r}", pattern=pattern)


def starts_with(prefix: str) -> Selector:
    return regex_names(f"^{re.escape(prefix)}")


def ends_with(suffix: str) -> Selector:
    return regex_names(f"{re.escape(suffix)}$")


def contains(substring: str) -> Selector:
    return regex_names(re.escape(substring))


def has_role(roles: Union[str, list[str]]) -> Selector:
    return Selector(description=f"roles {roles}", roles=roles)


def has_type(types: Union[str, list[str]]) -> Selector:
    return Selector(description=f"types {types}", types=types)


def all_predictors() -> Selector:
    return has_role("predictor")


def all_numeric_predictors() -> Selector:
    sel = all_predictors()
    sel.set_types(list(NUMERIC_TYPES))
    sel.description = "all numeric predictors"
    return sel


def all_outcomes() -> Selector:
    return has_role("outcome")


def all_groups() -> Selector:
    return has_role("group")


def all_sequences() -> Selector:
    return has_role("sequence")


def select_groups(ingredients: Ingredients) -> list[str]:
    """Group columns in table order (reference selector.py:312–320)."""
    return ingredients.select_roles("group")


def select_sequence(ingredients: Ingredients) -> list[str]:
    """Sequence columns in table order (reference selector.py:332–340)."""
    return ingredients.select_roles("sequence")
