"""Ingredients: a Spark DataFrame + per-column role metadata.

Mirrors the reference's ``Ingredients`` wrapper (reference
recipys/ingredients.py:8–87): composition over a DataFrame plus a
``roles: dict[col, list[str]]`` map. Unlike the reference (which
mutates the wrapped frame in place and caches a schema that goes stale,
ingredients.py:60–61), this wrapper is immutable-functional: every
update returns a new ``Ingredients``, and schema is always derived from
``df.schema`` on demand.
"""

from __future__ import annotations

import copy
from typing import Optional

from pyspark.sql import DataFrame


class Ingredients:
    """A Spark DataFrame plus a role map over its columns.

    Roles are free-form strings; the canonical ones assigned by
    ``Recipe`` are ``outcome``, ``predictor``, ``group``, ``sequence``
    (reference recipe.py:53–60). Each column maps to a *list* of roles
    (multi-role is allowed, reference ingredients.py:127–141).
    """

    def __init__(
        self,
        df: DataFrame,
        roles: Optional[dict[str, list[str]]] = None,
        check_roles: bool = True,
    ) -> None:
        if not isinstance(df, DataFrame):
            raise TypeError(f"Expected a pyspark DataFrame, got {type(df).__name__}")
        self._df = df
        if roles is None:
            roles = {}
        if not isinstance(roles, dict):
            raise TypeError("roles must be a dict[str, list[str]]")
        if check_roles:
            cols = set(df.columns)
            for col, rlist in roles.items():
                if col not in cols:
                    raise ValueError(f"role assigned to unknown column {col!r}")
                if not isinstance(rlist, list) or not all(isinstance(r, str) for r in rlist):
                    raise TypeError(f"roles for column {col!r} must be a list of strings")
        # deep-copy so callers can't mutate our state from the outside
        self.roles: dict[str, list[str]] = {c: list(rs) for c, rs in roles.items()}
        # memoized df.count(), see row_count()
        self._row_count: Optional[int] = None

    # -- frame access -------------------------------------------------

    @property
    def df(self) -> DataFrame:
        return self._df

    def get_df(self) -> DataFrame:
        return self._df

    @property
    def columns(self) -> list[str]:
        return self._df.columns

    @property
    def schema(self):
        """Always derived live from the wrapped frame (fixes the
        reference's stale-cache quirk, ingredients.py:60–61)."""
        return self._df.schema

    @property
    def dtypes(self) -> dict[str, str]:
        return dict(self._df.dtypes)

    def row_count(self) -> int:
        """Memoized ``df.count()`` — fitted steps that probe the input
        cardinality (resolve_exact's exact-vs-sketch switch) share ONE
        count job per frame instead of each launching its own scan; a
        recipe with several quantile-fitted steps would otherwise scan
        the input once per step. Row-preserving steps propagate the
        cache to their output Ingredients (Step.transform)."""
        if self._row_count is None:
            self._row_count = self._df.count()
        return self._row_count

    # -- functional updates -------------------------------------------

    def with_df(self, df: DataFrame) -> "Ingredients":
        """New Ingredients with the same roles over a new frame.

        Roles for columns no longer present are dropped silently (a
        step may remove columns); new columns start role-less.
        """
        cols = set(df.columns)
        roles = {c: rs for c, rs in self.roles.items() if c in cols}
        return Ingredients(df, roles, check_roles=False)

    def copy(self) -> "Ingredients":
        return Ingredients(self._df, copy.deepcopy(self.roles), check_roles=False)

    # -- role CRUD (reference ingredients.py:127–178) -------------------

    def add_role(self, column: str, new_role: str) -> "Ingredients":
        """Append a role to a column that already has at least one."""
        self._require_column(column)
        out = self.copy()
        if column not in out.roles or not out.roles[column]:
            raise RuntimeError(
                f"Column {column!r} has no roles yet; use update_role to set the first role."
            )
        if new_role not in out.roles[column]:
            out.roles[column].append(new_role)
        return out

    def update_role(
        self, column: str, new_role: str, old_role: Optional[str] = None
    ) -> "Ingredients":
        """Set or replace a role.

        Reference semantics (ingredients.py:143–178): if the column has
        no roles or exactly one role, replace wholesale; if it has
        several, ``old_role`` must name which one to replace, else
        error on ambiguity.
        """
        self._require_column(column)
        out = self.copy()
        current = out.roles.get(column, [])
        if old_role is not None:
            if old_role not in current:
                raise ValueError(
                    f"Column {column!r} does not have role {old_role!r} to replace."
                )
            out.roles[column] = [new_role if r == old_role else r for r in current]
        elif len(current) <= 1:
            out.roles[column] = [new_role]
        else:
            raise ValueError(
                f"Column {column!r} has multiple roles {current}; pass old_role to disambiguate."
            )
        return out

    def select_roles(self, *roles: str) -> list[str]:
        """Columns having any of the given roles, in table column order."""
        want = set(roles)
        return [c for c in self.columns if want & set(self.roles.get(c, []))]

    # -- helpers --------------------------------------------------------

    def _require_column(self, column: str) -> None:
        if column not in self._df.columns:
            raise ValueError(f"Column {column!r} not in DataFrame.")

    def __getitem__(self, column: str) -> "DataFrame":
        self._require_column(column)
        return self._df.select(column)

    def __repr__(self) -> str:  # pragma: no cover
        return f"Ingredients(columns={self.columns}, roles={self.roles})"
