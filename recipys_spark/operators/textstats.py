"""StepTextFeatures: text-analysis features as a recipe step (over the
transcript ``text`` column or any string column)."""

from __future__ import annotations

from typing import Optional

from pyspark.sql import functions as F

from recipys_spark.ingredients import Ingredients
from recipys_spark.operators.base import Step
from recipys_spark.selector import Selector, has_type
from recipys_spark.functions import text as TX


class StepTextFeatures(Step):
    """Adds per-column text features: ``{c}_n_chars``, ``{c}_n_tokens``,
    ``{c}_punct_ratio``, ``{c}_quality``, ``{c}_lang``,
    ``{c}_fingerprint`` — all JVM-side expressions."""

    _uses_groups = False
    _uses_sequence = False

    FEATURES = ("n_chars", "n_tokens", "punct_ratio", "quality", "lang", "fingerprint")

    def __init__(
        self,
        sel: Optional[Selector] = None,
        features: Optional[tuple[str, ...]] = None,
        role: str = "predictor",
    ) -> None:
        super().__init__(sel if sel is not None else has_type("string"))
        self.features = tuple(features) if features else self.FEATURES
        unknown = set(self.features) - set(self.FEATURES)
        if unknown:
            raise ValueError(f"unknown text features: {sorted(unknown)}")
        self.role = role
        self.desc = f"Text features {self.features}"

    def new_column_roles(self) -> dict[str, str]:
        return {f"{c}_{f}": self.role for c in self.columns for f in self.features}

    def do_transform(self, ingredients: Ingredients):
        df = ingredients.df
        exprs = []
        for c in self.columns:
            col = F.col(c)
            builders = {
                "n_chars": lambda: F.length(col),
                "n_tokens": lambda: TX.token_count(col),
                "punct_ratio": lambda: F.round(TX.punct_ratio(col), 6),
                "quality": lambda: TX.quality_score(col),
                "lang": lambda: TX.lang_guess(col),
                "fingerprint": lambda: TX.fingerprint(col),
            }
            for f in self.features:
                exprs.append(builders[f]().alias(f"{c}_{f}"))
        return df.select("*", *exprs)
