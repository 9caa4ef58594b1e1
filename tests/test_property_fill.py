"""Property-based check (hypothesis) of the trickiest fill logic:
directional fill with limit=k across random group/null patterns must
match the pandas oracle exactly — including null runs longer than the
limit, leading/trailing nulls, and single-row groups. The reference
has no property testing (SURVEY.md §5); this guards the null-run
distance windows in impute.py against off-by-one regressions."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from recipys_spark import Recipe
from recipys_spark.operators import StepImputeFill
from recipys_spark.selector import all_of


@st.composite
def frames(draw):
    n = draw(st.integers(min_value=1, max_value=24))
    groups = draw(
        st.lists(st.integers(min_value=0, max_value=3), min_size=n, max_size=n)
    )
    vals = draw(
        st.lists(
            st.one_of(st.none(), st.integers(min_value=-9, max_value=9)),
            min_size=n,
            max_size=n,
        )
    )
    return pd.DataFrame(
        {
            "g": groups,
            "t": range(n),
            "x": [float(v) if v is not None else np.nan for v in vals],
        }
    )


def pandas_fill(pdf, forward, limit):
    g = pdf.sort_values(["g", "t"]).groupby("g")["x"]
    out = g.ffill(limit=limit) if forward else g.bfill(limit=limit)
    return out.to_numpy()


@pytest.mark.parametrize(
    "forward,limit",
    [(True, 1), (True, 2), (False, 1), (False, 3)],
    ids=["ffill1", "ffill2", "bfill1", "bfill3"],
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pdf=frames())
def test_limited_fill_matches_pandas(spark, forward, limit, pdf):
    df = spark.createDataFrame(pdf)
    rec = Recipe(df, predictors=["x"], groups="g", sequences="t").add_step(
        StepImputeFill(
            sel=all_of(["x"]),
            strategy="forward" if forward else "backward",
            limit=limit,
        )
    )
    got = (
        rec.prep().orderBy("g", "t").toPandas()["x"].to_numpy(dtype=float)
    )
    exp = pandas_fill(pdf, forward, limit)
    np.testing.assert_array_equal(
        np.where(np.isnan(got), None, got), np.where(np.isnan(exp), None, exp)
    )
