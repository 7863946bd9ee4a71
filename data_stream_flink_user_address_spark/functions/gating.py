"""The size-gated broadcast idiom, extracted once.

Three operator families grew the same count-then-gate logic by hand
(``leakage_free_split``'s holdout guard, ``unigram_lm_encode``'s
distinct-word frame, ``remove_dup_spans``' span arrays).  VERDICT r16
"What's wrong #3": one implementation so the next site can't get the
gate subtly wrong.

The idiom: a join side that is SMALL in the usual regime but UNBOUNDED
in an adversarial one (a percentage holdout of a 100 TB corpus, the
distinct-word set of web text, a heavily-duplicated corpus's flagged
docs) must not be blindly ``F.broadcast``-hinted -- an unconditional
broadcast OOMs every executor exactly when the data is worst.  Count
first, hint only under a row budget, and fall back to a plain hash
join above it (AQE may still pick a runtime broadcast if the frame
turns out small after filters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BROADCAST_MAX_ROWS = 2_000_000


def size_gated_broadcast(
    df: DataFrame,
    force: bool | None = None,
    max_rows: int = DEFAULT_BROADCAST_MAX_ROWS,
    gate_df: DataFrame | None = None,
) -> tuple[DataFrame, bool]:
    """Return ``(df, did_broadcast)`` where ``df`` carries the
    ``F.broadcast`` hint iff it fits under ``max_rows``.

    ``force=None`` (the default) counts to decide; ``True``/``False``
    skips the count and forces the side -- the caller's escape hatch
    when it already knows the regime.

    When the gate must count, ``df`` itself is lazily
    ``localCheckpoint``-ed FIRST so the deciding count and the
    downstream join share one materialization instead of recomputing
    the frame's lineage twice (ADVICE r16: both ``unigram_lm_encode``
    and ``remove_dup_spans`` were paying a second full upstream pass
    for the count).  ``gate_df`` substitutes a slimmer frame whose
    count the CALLER deems an acceptable gate -- use it when ``df``'s
    own lineage is expensive per row (e.g. a ``mapInPandas`` stage
    whose input frame is the honest row count).  ``gate_df`` need NOT
    be same-cardinality: when ``df`` is a constant-factor expansion of
    it (e.g. a band table with ``bands`` rows per gated key), the
    caller must shrink ``max_rows`` by that factor so the budget
    bounds the rows actually broadcast (ADVICE r17: the decontaminate
    gate admitted ``bands``x its stated budget).  The caller then owns
    any reuse of ``gate_df``'s materialization, and ``df`` is NOT
    checkpointed here (its single downstream consumer needs no
    sharing).
    """
    if force is None:
        if gate_df is None:
            df = df.localCheckpoint(eager=False)
            gate_df = df
        force = gate_df.count() <= max_rows
    return (F.broadcast(df) if force else df), bool(force)
