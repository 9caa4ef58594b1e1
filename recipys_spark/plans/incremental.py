"""Incremental bake: recompute only the conversations new data touches.

At 10^12 turns, appending a day of transcripts and re-baking the whole
table is the dominant cost of a naive pipeline. Every per-conversation
feature in this engine (expanding accumulators, fills, lag/lead,
sessionization) depends only on the conversation's OWN rows, and fitted
global state is frozen at bake time — so a correct incremental bake is:

1. affected = distinct group keys present in the new rows;
2. rebake the FULL history of just those groups (semi join — with the
   input partitioned/bucketed by conv_id this prunes, not scans);
3. keep all other groups' previous output untouched (anti join);
4. union.

Exactly equal to a full re-bake (tested), while touching
|affected| / |groups| of the data. Steps with cross-group fitted state
are safe because bake never refits; steps whose TRANSFORM mixes groups
(none in the core library) would need a full bake — callers can check
``recipe.steps`` if they add such a step.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from recipys_spark.recipe import Recipe


def incremental_bake(
    recipe: Recipe,
    full_input: DataFrame,
    new_rows: DataFrame,
    previous_output: DataFrame,
    groups: Union[str, Sequence[str]],
) -> DataFrame:
    """Bake only the groups that ``new_rows`` touches.

    ``full_input`` must contain the complete (old + new) history —
    expanding features need a conversation's full past; ``new_rows``
    only identifies which groups changed. ``previous_output`` is the
    last bake's result for the untouched groups."""
    keys = [groups] if isinstance(groups, str) else list(groups)
    affected = new_rows.select(*keys).distinct()
    # no broadcast hint: a day's append can touch millions of groups;
    # AQE broadcasts the key set when it is actually small
    todo = full_input.join(affected, on=keys, how="left_semi")
    keep = previous_output.join(affected, on=keys, how="left_anti")
    baked = recipe.bake(todo)
    return keep.unionByName(baked.select(*previous_output.columns))
