"""Canonical window specs shared by every step.

All grouped time-series steps build their frames from these helpers so
the specs are *identical* objects in the plan — Catalyst then collapses
adjacent window functions over the same (partitionBy, orderBy) into a
single Window exec: one shuffle + one sort for the whole recipe
(SURVEY.md §4).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Window, WindowSpec


def conv_window(groups: Sequence[str], sequence: Sequence[str]) -> WindowSpec:
    """partitionBy(groups).orderBy(sequence) — the engine's canonical spec.

    With no group columns the window is global (single partition —
    correct but non-scalable; steps warn upstream).
    """
    w = Window.partitionBy(*groups) if groups else Window.partitionBy()
    return w.orderBy(*sequence) if sequence else w


def expanding(groups: Sequence[str], sequence: Sequence[str]) -> WindowSpec:
    """Expanding row frame including the current row: the reference's
    cum_*/expanding() semantics (reference step.py:317–358)."""
    return conv_window(groups, sequence).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )


def trailing(groups: Sequence[str], sequence: Sequence[str], k: int) -> WindowSpec:
    """Bounded trailing row frame [-k, 0]."""
    return conv_window(groups, sequence).rowsBetween(-k, Window.currentRow)


def following(groups: Sequence[str], sequence: Sequence[str]) -> WindowSpec:
    """Current row to end of group (for backward fill)."""
    return conv_window(groups, sequence).rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )


def group_frame(groups: Sequence[str]) -> WindowSpec:
    """Whole-group unordered frame (per-group scalar aggregates, e.g.
    group-mean imputation)."""
    return Window.partitionBy(*groups) if groups else Window.partitionBy()
