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
    _stream_safe = True  # fitted state replays as a stateless projection/map
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


def unigram_logprob_scores(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_df=None,
    round_dp: int = 9,
):
    """Statistical text-quality scoring: per-document mean unigram
    log-probability under an add-1-smoothed unigram language model.

    Gibberish, wrong-language, and boilerplate-free random text score
    far below typical corpus text — the classic cheap LM filter a
    training-data pipeline runs after the heuristic quality_score tier.
    ``vocab_df`` (a (token, c) count table, e.g. from a trusted
    reference corpus) enables cross-scoring; by default the model is
    fitted on ``df`` itself (self-perplexity).

    Returns (id, n_scored, n_oov, avg_logprob); documents with no
    tokens are absent. Scale shape: one token-count aggregation (only
    when self-fitting), one vocab join with NO forced broadcast hint —
    AQE measures the post-shuffle vocab size at runtime and converts to
    a broadcast join when it fits (a 10^6-token vocab does; the
    10^8–10^9-distinct-token vocabulary of a self-fit 100 TB web
    corpus does not, and a forced hint there would OOM the build side
    — it degrades to a sort-merge join on the token instead), then
    one per-doc aggregation. Per-token log-probs are rounded to
    ``round_dp`` BEFORE the exact-decimal mean so the result is
    bit-identical across engines and parallelism (ln differs in the
    last ulp between libms; the decimal sum of rounded operands does
    not)."""
    from pyspark.sql import functions as F

    from recipys_spark.functions.deterministic import det_sum

    toks = df.select(
        F.col(id_col), F.explode(TX.tokens(F.col(text_col))).alias("t")
    )
    vocab = (
        vocab_df
        if vocab_df is not None
        else toks.groupBy("t").agg(F.count("*").alias("c"))
    )
    tot = vocab.agg(
        F.sum("c").alias("n"), F.count("*").alias("v")
    )
    lp = (
        vocab.crossJoin(F.broadcast(tot))
        .select(
            "t",
            F.round(
                F.log((F.col("c") + 1) / (F.col("n") + F.col("v"))), round_dp
            ).alias("logp"),
        )
    )
    oov = tot.select(
        F.round(F.log(1.0 / (F.col("n") + F.col("v"))), round_dp).alias("oov_logp")
    )
    # deliberately NO F.broadcast(lp): an explicit hint never degrades,
    # and the vocabulary is unbounded in self-fit mode (10^8+ distinct
    # tokens on a web corpus → build-side OOM). lp sits behind a shuffle
    # (groupBy), so AQE converts this to a broadcast join at runtime
    # whenever the measured vocab size is under the threshold — the
    # small-vocab fast path is preserved without the unbounded risk.
    scored = (
        toks.join(lp, "t", "left")
        .crossJoin(F.broadcast(oov))
        .select(
            id_col,
            F.coalesce("logp", "oov_logp").alias("lp"),
            F.col("logp").isNull().cast("int").alias("is_oov"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_scored"),
        F.sum("is_oov").alias("n_oov"),
        # exact decimal sum → double, THEN divide (the det_mean shape —
        # decimal/long division has different scale rules per engine)
        F.round(
            det_sum(F.col("lp")).cast("double") / F.count("*"), 6
        ).alias("avg_logprob"),
    )


def gopher_exprs(c) -> "dict":
    """The Gopher signal expressions over one string column — shared by
    the table-level ``gopher_signals`` and the recipe-step
    ``StepGopherSignals``."""
    toks = TX.tokens(c)
    n_words = F.size(toks)
    sum_len = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    n_hash = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    n_ell = F.length(c) - F.length(F.replace(c, F.lit("\u2026"), F.lit("")))

    lines = F.filter(F.split(c, "\n"), lambda x: F.length(F.trim(x)) > 0)
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(lines, lambda x: x.rlike(r"^\s*[-*\u2022] ")))
    n_ell_line = F.size(
        F.filter(lines, lambda x: x.rlike(r"(\.\.\.|\u2026)\s*$"))
    )
    n_dup_lines = n_lines - F.size(F.array_distinct(lines))
    line_chars = F.aggregate(lines, F.lit(0), lambda a, x: a + F.length(x))
    # characters on lines occurring >1 time. The naive form (for each
    # line, scan `lines` for equals) is O(lines\u00b2) AND \u2014 interpreted
    # HOFs having no CSE \u2014 re-evaluated the split+trim-filter for
    # every scanned element. Sort instead: a line is duplicated iff a
    # sorted neighbor equals it (string equality is binary, so the
    # per-occurrence length sum is the same multiset sum in any
    # order). The sorted array is bound ONCE as a lambda variable (the
    # ngram/chunk_documents binding pattern); F.get returns NULL out
    # of bounds, and NULL == x is NULL \u2192 falsy in `when`, so the
    # boundary rows need no special case.
    dup_chars = F.get(
        F.transform(
            F.array(F.array_sort(lines)),
            lambda sl: F.aggregate(
                F.transform(
                    sl,
                    lambda x, i: F.when(
                        (x == F.get(sl, i - 1)) | (x == F.get(sl, i + 1)),
                        F.length(x),
                    ).otherwise(0),
                ),
                F.lit(0),
                lambda a, v: a + v,
            ),
        ),
        F.lit(0),
    )

    def ratio(num, den):
        return F.round(F.when(den > 0, num.cast("double") / den), 6)

    return {
        "n_words": n_words,
        "mean_word_len": ratio(sum_len, n_words),
        "symbol_word_ratio": ratio(n_hash + n_ell, n_words),
        "alpha_word_frac": ratio(n_alpha, n_words),
        "bullet_line_frac": ratio(n_bullet, n_lines),
        "ellipsis_line_frac": ratio(n_ell_line, n_lines),
        "dup_line_frac": ratio(n_dup_lines, n_lines),
        "dup_line_char_frac": ratio(dup_chars, line_chars),
    }


def gopher_signals(df, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document repetition / quality signals in the style of the
    Gopher data-curation rules (Rae et al. 2021, arXiv 2112.11446,
    table A1): the standard pre-training filter suite beyond simple
    token counts.

    All pure JVM expressions with exact DuckDB mirrors:

    - ``n_words``, ``mean_word_len`` — whitespace words;
    - ``symbol_word_ratio`` — '#' and '…' occurrences per word
      (boilerplate/markup smell);
    - ``alpha_word_frac`` — words containing ≥1 ASCII letter;
    - ``bullet_line_frac`` / ``ellipsis_line_frac`` — of non-empty
      lines (listicle / truncation smells);
    - ``dup_line_frac`` — duplicated non-empty lines / lines;
    - ``dup_line_char_frac`` — characters inside lines that occur more
      than once / total line characters. Computed over the SORTED line
      array (duplicated ⟺ a sorted neighbor is equal): O(lines log
      lines) per document, with the sorted array bound once as a
      lambda variable so the interpreted HOF never re-evaluates the
      split.

    Ratios are NULL when the denominator is 0 (no words / no lines).
    """
    exprs = gopher_exprs(F.col(text_col))
    return df.select(
        F.col(id_col), *[e.alias(name) for name, e in exprs.items()]
    )



class StepGopherSignals(Step):
    """Recipe-step form of ``gopher_signals``: appends the repetition /
    quality signal columns ``{c}_gopher_{signal}`` for every selected
    string column — stateless, pure expressions, fuses into the scan
    projection like StepTextFeatures."""

    _uses_groups = False
    _stream_safe = True  # fitted state replays as a stateless projection/map
    _uses_sequence = False

    def __init__(self, sel=None, role: str = "predictor") -> None:
        from recipys_spark.selector import has_type

        super().__init__(sel if sel is not None else has_type("string"))
        self.role = role
        self.desc = "Gopher quality signals"

    SIGNALS = (
        "n_words",
        "mean_word_len",
        "symbol_word_ratio",
        "alpha_word_frac",
        "bullet_line_frac",
        "ellipsis_line_frac",
        "dup_line_frac",
        "dup_line_char_frac",
    )

    def new_column_roles(self) -> dict:
        return {
            f"{c}_gopher_{sig}": self.role
            for c in self.columns
            for sig in self.SIGNALS
        }

    def do_transform(self, ingredients: Ingredients):
        df = ingredients.df
        exprs = []
        for c in self.columns:
            for name, e in gopher_exprs(F.col(c)).items():
                exprs.append(e.alias(f"{c}_gopher_{name}"))
        return df.select("*", *exprs)
