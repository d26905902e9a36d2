"""Structured-Streaming validation.

The reference library has no streaming surface (callers validate values
one at a time — which IS streaming, row-at-a-time). The Spark-native
translation: the SAME compiled spec applied to an unbounded DataFrame.
Because every row-level check is a stateless Column predicate, the whole
keyword engine lifts to Structured Streaming unchanged — `annotate` and
`violations` are per-row projections/filters (no state, no watermark
needed); windowed verdict aggregation adds event-time grouping with a
watermark for late data.

Usage::

    stream = spark.readStream.format(...).load()
    res = StreamingValidator(spec).annotate(stream)       # adds _valid
    bad = StreamingValidator(spec).violations(stream)     # violation rows
    v = StreamingValidator(spec).windowed_verdicts(
        stream, ts_col="ts", window="1 minute", watermark="2 minutes")
    v.writeStream.outputMode("append")...
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jsonschema_validator_spark.engine import ValidationResult, Validator
from jsonschema_validator_spark.spec import Spec


class StreamingValidator:
    """Compile once, apply to micro-batches forever (the spec compiles
    against the stream's static schema — per-batch cost is zero)."""

    def __init__(
        self,
        spec: Union[Spec, dict, str],
        stop_on_first_error: bool = False,
        non_fatal_verdicts: bool = False,
    ):
        self._v = Validator(
            spec,
            stop_on_first_error=stop_on_first_error,
            non_fatal_verdicts=non_fatal_verdicts,
        )

    def _result(self, stream: DataFrame) -> ValidationResult:
        return self._v.validate(stream)

    def annotate(self, stream: DataFrame, with_checks: bool = False) -> DataFrame:
        """Stream + `_valid` boolean (quarantine-in-line pattern)."""
        return self._result(stream).annotate(with_checks=with_checks)

    def valid_rows(self, stream: DataFrame) -> DataFrame:
        return self._result(stream).valid_rows()

    def violations(
        self, stream: DataFrame, include: Optional[Sequence[str]] = None
    ) -> DataFrame:
        """Violation rows `(path, message, value, tag, param)` as a stream."""
        return self._result(stream).violations(include=include)

    def windowed_verdicts(
        self,
        stream: DataFrame,
        ts_col: str,
        window: str = "1 minute",
        watermark: str = "2 minutes",
    ) -> DataFrame:
        """Per-event-time-window, per-rule verdict counts with a watermark
        so late rows update the right window and state is bounded.

        Output: `window, rule_id, tag, n_checked, n_failed, pass` —
        the streaming analogue of ``ValidationResult.verdicts``.
        """
        from jsonschema_validator_spark.engine import unpivot_verdicts

        res = self._result(stream)
        checks = res.compiled.checks
        wm = stream.withWatermark(ts_col, watermark)
        if not checks:
            # zero compiled checks: the F.array()-of-nothing unpivot fails
            # analysis (the batch verdicts() guard, mirrored) — emit an
            # empty STREAMING frame with the stable schema
            return wm.filter(F.lit(False)).select(
                F.window(F.col(ts_col), window).alias("window"),
                F.lit(None).cast("string").alias("rule_id"),
                F.lit(None).cast("string").alias("tag"),
                F.lit(None).cast("long").alias("n_checked"),
                F.lit(None).cast("long").alias("n_failed"),
                F.lit(None).cast("boolean").alias("pass"),
            )
        aggs = [F.count(F.lit(1)).alias("_n")]
        for i, c in enumerate(checks):
            aggs.append(F.sum((~c.predicate).cast("long")).alias(f"_f{i}"))
        agged = wm.groupBy(F.window(F.col(ts_col), window).alias("window")).agg(*aggs)
        # warn ≡ loose; non_fatal_verdicts is the engine-native softener —
        # the shared unpivot carries both conventions (one copy, batch +
        # streaming)
        return unpivot_verdicts(agged, checks, ["window"], res.non_fatal_verdicts)


__all__ = ["StreamingValidator"]
