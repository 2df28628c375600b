"""Probabilistic record linkage (Fellegi-Sunter 1969): blocked
candidate generation + per-field agreement weights summed to a match
score — the classic entity-resolution scorer that complements the
reference's deterministic lookup cascade (resolve.py, which requires an
exact/contains hit) with a weighted-evidence decision over MULTIPLE
fields.

Weights are INTEGER log-odds in centiunits (agree/disagree per field),
so scores are engine-exact bigints: the DuckDB oracle reproduces every
decision bit-for-bit — no float likelihood anywhere.

Scale shape: one equi-join on the blocking key (never a cross join);
per-block quadratic cost is the standard linkage trade-off, controlled
by blocking-key selectivity (the blocking key IS the recall/cost knob:
coarse keys find more pairs and cost more). Field comparators run
inside whole-stage codegen on the joined rows.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class FieldComparison:
    """One field's evidence: ``agree`` is a ZERO-ARGUMENT callable
    returning a BooleanColumn built over the ``a.``/``b.`` dataframe
    aliases (e.g. ``lambda: F.col("a.name") == F.col("b.name")``),
    plus integer agree/disagree weights (centi-log-odds; positive for
    agreement evidence, negative for disagreement)."""

    name: str
    agree: "callable"
    w_agree: int
    w_disagree: int


def linkage_scores(
    a: DataFrame,
    b: DataFrame,
    *,
    block_on: list[str],
    fields: list[FieldComparison],
    id_col: str = "id",
) -> DataFrame:
    """Score every blocked (a, b) candidate pair: per-field weight
    columns ``w_<name>`` (w_agree when the comparator fires, else
    w_disagree) and their sum ``score``.

    Both inputs must carry ``id_col`` and the ``block_on`` columns with
    identical names; compared columns are referenced through the
    ``a.``/``b.`` aliases inside each comparator."""
    if not fields:
        raise ValueError("linkage_scores needs at least one FieldComparison")
    aa, bb = a.alias("a"), b.alias("b")
    cond = None
    for k in block_on:
        eq = F.col(f"a.{k}") == F.col(f"b.{k}")
        cond = eq if cond is None else cond & eq
    pairs = aa.join(bb, cond, "inner")
    weight_cols: list[Column] = []
    out_cols: list[Column] = [
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
    ]
    for fc in fields:
        w = (
            F.when(fc.agree(), F.lit(fc.w_agree))
            .otherwise(F.lit(fc.w_disagree))
            .cast("long")
            .alias(f"w_{fc.name}")
        )
        weight_cols.append(w)
    out_cols.extend(weight_cols)
    scored = pairs.select(*out_cols)
    total = None
    for fc in fields:
        c = F.col(f"w_{fc.name}")
        total = c if total is None else total + c
    return scored.withColumn("score", total.cast("long"))


def linkage_matches(
    scores: DataFrame, *, threshold: int
) -> DataFrame:
    """Pairs whose summed evidence clears the match threshold."""
    return scores.filter(F.col("score") >= threshold)
