"""Schema/shape checks on the interleaved-span documents table.

AMiner analogs: NewMatchPathDetector (unknown parser path ≙ unknown span
kind), JsonModelElement strictness (missing/extra keys ≙ required fields
null), TimestampsUnsortedDetector (ordering ≙ offset monotonicity per doc).
All checks run on the exploded spans view and emit violation rows under the
span-sequence (kind, text, media_ref, order) invariant.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unknown_kinds(spans_flat: DataFrame, kind_vocab: Sequence[str]) -> DataFrame:
    """Spans whose kind is outside the registered vocabulary."""
    return spans_flat.filter(~F.col("kind").isin(*kind_vocab))


def required_non_null(spans_flat: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Spans with any required field null (no required fields -> no
    violations, not filter(None))."""
    cond = F.lit(False)
    for c in cols:
        cond = cond | F.col(c).isNull()
    return spans_flat.filter(cond)


def offsets_monotonic(documents: DataFrame) -> DataFrame:
    """Documents whose span offsets do not strictly increase in array order.

    Checked INSIDE the spans array (pure expression over the row, zero
    shuffle) rather than via a window over the exploded view — which would
    both shuffle and mis-group when doc_id uniqueness is itself violated."""
    spans = F.col("spans")
    bad = F.exists(
        F.sequence(F.lit(1), F.size(spans) - 1),
        lambda i: F.element_at(spans, i + 1)["offset"] <= F.element_at(spans, i)["offset"],
    )
    return documents.filter((F.size(spans) >= 2) & bad)


def media_kind_consistency(spans_flat: DataFrame) -> DataFrame:
    """media_ref must only appear on media-ish kinds (image/audio/video)."""
    return spans_flat.filter(
        F.col("media_ref").isNotNull()
        & ~F.col("kind").isin("image", "audio", "video")
    )
