"""Stateful streaming deduplication — ``applyInPandasWithState``.

The batch dedup operators (operators/dedup.py) see the whole corpus at
once; a streaming ingest pipeline must suppress duplicates ACROSS
micro-batches. This is the custom-stateful-operator shape from the build
brief (``applyInPandasWithState`` over a keyed stream): state is one
counter per content fingerprint, so a document whose canonicalized text was
ever seen before is dropped, and only the first occurrence (lowest id
within its arrival batch) is emitted downstream.

Scale notes:
- State size is O(distinct fingerprints) × ~24 bytes — at 100 TB use the
  RocksDB state store provider and (optionally) a processing-time timeout
  to bound retention to the dedup horizon.
- The fingerprint groupBy is the same 64-bit md5-prefix key as
  ``operators.dedup.exact_duplicates`` — balanced shuffle. Batch vs stream
  results agree when ingestion is ordered (ids monotone with arrival): the
  stream emits the lowest id within the key's FIRST micro-batch, while
  batch semantics pick the global minimum id — a lower id arriving in a
  later batch would win under batch but has already been suppressed here.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from jsonschema_validator_spark.operators.dedup import _fingerprint

_FP_COL = "_fp"


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    state_ttl_ms: int = 0,
) -> DataFrame:
    """First-seen-only pass-through of a document stream.

    Emits each content fingerprint's first row (lowest ``id_col`` in its
    first arrival batch); every later row with the same canonicalized text
    — same batch or any later batch — is suppressed via per-key state.
    Output schema == input schema.

    ``state_ttl_ms``: when > 0, per-key state expires after that many ms
    of processing-time inactivity (``GroupStateTimeout.ProcessingTimeTimeout``)
    — the dedup horizon. At 10^12-row scale unbounded state is the one
    thing that can kill this operator; a TTL bounds the state store to
    O(distinct fingerprints within the horizon) at the cost of re-admitting
    a duplicate that recurs after the horizon (the standard trade —
    combine with the RocksDB state store provider for large horizons).
    A key whose state expired behaves exactly like a never-seen key.

    CAUTION: with a TTL the engine continuously schedules state-cleanup
    micro-batches, so ``processAllAvailable()`` never settles on an idle
    stream — drain with ``awaitTermination`` or poll the sink (see
    tests/test_streaming.py::test_streaming_dedup_state_ttl).
    """
    cols = list(stream.columns)
    out_schema = stream.schema
    use_ttl = state_ttl_ms > 0

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if key[0] is None:
            # NULL text ⇒ NULL fingerprint: no content means no identity,
            # so these rows are NOT duplicates of each other — pass every
            # one through untouched, keep no state (the batch family's
            # settled NULL-text convention; deduping them would silently
            # delete all but one of the corpus' NULL docs AND funnel them
            # all through one hot state key)
            for pdf in pdfs:
                if len(pdf):
                    yield pdf[cols]
            return
        if use_ttl and state.hasTimedOut:
            # horizon passed with no new arrivals: drop the fingerprint
            state.remove()
            return
        prior = state.get[0] if state.exists else 0
        total = prior
        best = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            total += len(pdf)
            if prior == 0:
                # NULL ids sort last (min of the non-null ids); an
                # all-NULL-id chunk falls back to the first row —
                # idxmin() on all-NaN returns NaN and .loc[[nan]] would
                # crash the whole streaming query
                sub = pdf[pdf[id_col].notna()]
                pick = sub[id_col].idxmin() if len(sub) else pdf.index[0]
                cand = pdf.loc[[pick]]
                if (
                    best is None
                    or (
                        cand[id_col].notna().iloc[0]
                        and (
                            best[id_col].isna().iloc[0]
                            or cand[id_col].iloc[0] < best[id_col].iloc[0]
                        )
                    )
                ):
                    best = cand
        state.update((total,))
        if use_ttl:
            state.setTimeoutDuration(state_ttl_ms)
        if prior == 0 and best is not None:
            yield best[cols]

    # THE single copy of the fingerprint formula (operators/dedup.py) —
    # inlining it here would let the streaming twin desynchronize from
    # the batch operators and the curation funnel (ADVICE r4)
    keyed = stream.withColumn(_FP_COL, _fingerprint(F.col(text_col)))
    return keyed.groupBy(_FP_COL).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="n_seen long",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if use_ttl
            else GroupStateTimeout.NoTimeout
        ),
    )


__all__ = ["streaming_exact_dedup"]
