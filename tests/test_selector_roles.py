"""Selector resolution and role CRUD (reference tests/test_selectors.py
and tests/test_ingredients.py:98–152 re-expressed)."""

import pytest

from recipys_spark import Recipe
from recipys_spark.ingredients import Ingredients
from recipys_spark.selector import (
    Selector,
    all_numeric_predictors,
    all_of,
    all_outcomes,
    all_predictors,
    contains,
    ends_with,
    has_role,
    has_type,
    regex_names,
    select_groups,
    select_sequence,
    starts_with,
)


def test_select_by_name(example_ingredients):
    assert all_of(["x1", "x3"])(example_ingredients) == ["x1", "x3"]


def test_name_order_is_table_order(example_ingredients):
    # selection preserves table column order regardless of request order
    assert all_of(["x3", "x1"])(example_ingredients) == ["x1", "x3"]


def test_missing_name_raises(example_ingredients):
    with pytest.raises(ValueError):
        all_of(["nope"])(example_ingredients)


def test_select_by_role(example_ingredients):
    assert all_predictors()(example_ingredients) == ["x1", "x2", "x3", "x4"]
    assert all_outcomes()(example_ingredients) == ["y"]
    assert has_role("group")(example_ingredients) == ["id"]


def test_select_by_type(example_ingredients):
    assert has_type("double")(example_ingredients) == ["y", "x1", "x2"]
    assert has_type("string")(example_ingredients) == ["x3", "x4"]


def test_numeric_predictors(example_ingredients):
    assert all_numeric_predictors()(example_ingredients) == ["x1", "x2"]


def test_regex_helpers(example_ingredients):
    assert regex_names("^x")(example_ingredients) == ["x1", "x2", "x3", "x4"]
    assert starts_with("x")(example_ingredients) == ["x1", "x2", "x3", "x4"]
    assert ends_with("1")(example_ingredients) == ["x1"]
    assert contains("im")(example_ingredients) == ["time"]


def test_intersection_of_filters(example_ingredients):
    sel = Selector("numeric x", roles="predictor", types="double", pattern="^x")
    assert sel(example_ingredients) == ["x1", "x2"]


def test_group_sequence_helpers(example_ingredients):
    assert select_groups(example_ingredients) == ["id"]
    assert select_sequence(example_ingredients) == ["time"]


def test_selector_requires_ingredients(example_df):
    with pytest.raises(TypeError):
        all_predictors()(example_df)


# -- role CRUD ----------------------------------------------------------


def test_update_role_replaces_single(example_ingredients):
    ing = example_ingredients.update_role("x1", "outcome")
    assert ing.roles["x1"] == ["outcome"]
    # original untouched (immutable-functional)
    assert example_ingredients.roles["x1"] == ["predictor"]


def test_add_role_appends(example_ingredients):
    ing = example_ingredients.add_role("x1", "aux")
    assert ing.roles["x1"] == ["predictor", "aux"]


def test_add_role_requires_existing(spark, example_df):
    ing = Ingredients(example_df)
    with pytest.raises(RuntimeError):
        ing.add_role("x1", "predictor")


def test_update_role_ambiguous(example_ingredients):
    ing = example_ingredients.add_role("x1", "aux")
    with pytest.raises(ValueError):
        ing.update_role("x1", "other")
    ing2 = ing.update_role("x1", "other", old_role="aux")
    assert ing2.roles["x1"] == ["predictor", "other"]


def test_update_role_missing_old(example_ingredients):
    with pytest.raises(ValueError):
        example_ingredients.update_role("x1", "new", old_role="nonexistent")


def test_unknown_column(example_ingredients):
    with pytest.raises(ValueError):
        example_ingredients.update_role("zzz", "predictor")


def test_roles_must_reference_existing_columns(example_df):
    with pytest.raises(ValueError):
        Ingredients(example_df, roles={"ghost": ["predictor"]})


# -- recipe lifecycle -----------------------------------------------------


def test_recipe_assigns_roles(example_recipe):
    roles = example_recipe.data.roles
    assert roles["y"] == ["outcome"]
    assert roles["id"] == ["group"]
    assert roles["time"] == ["sequence"]
    for c in ["x1", "x2", "x3", "x4"]:
        assert roles[c] == ["predictor"]


def test_empty_recipe_bake(example_recipe, example_df):
    out = example_recipe.bake(example_df)
    assert out.count() == 10


def test_check_data_rejects_schema_drift(example_recipe, example_df):
    with pytest.raises(ValueError):
        example_recipe.prep(example_df.drop("x4"))


def test_add_step_type_check(example_recipe):
    with pytest.raises(TypeError):
        example_recipe.add_step(lambda df: df)


def test_sklearn_gate_raises_cleanly():
    """sklearn is not installed in this environment; the escape hatch
    must fail at construction with a clear ImportError, and only when
    sklearn is actually missing."""
    from recipys_spark.operators.sklearn_compat import HAS_SKLEARN, StepSklearn

    if not HAS_SKLEARN:
        with pytest.raises(ImportError):
            StepSklearn(object())


def test_cached_recipe_repr_and_role_guard(example_recipe):
    """cache() drops the data reference; repr must still work (reads
    the cached roles) and role mutation must fail with a clear error,
    not an AttributeError on None."""
    import pytest as _pytest

    example_recipe.cache()
    r = repr(example_recipe)
    assert "Recipe(roles=" in r
    with _pytest.raises(ValueError, match="cache"):
        example_recipe.add_roles("x1", "predictor")
    with _pytest.raises(ValueError, match="cache"):
        example_recipe.update_roles("x1", "outcome")
