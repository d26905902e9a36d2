"""The Validator engine: one-pass multi-rule evaluation.

Execution model (SURVEY.md §4.3 item 3 — the engine's own operator fusion):
ALL row-level checks are packed into a single projection over one scan.
Catalyst then gets a flat boolean expression tree per rule — whole-stage
codegen evaluates every keyword for a row in one pass over the row, and the
`bytes` column is never read unless an image check references it (column
pruning is preserved because predicates only reference their own columns).

Three consumers, three physical shapes:
- ``verdicts``  — ONE aggregate pass: ``sum(fail_i)`` per rule inside a
  single ``groupBy(partition)`` — partial aggregation map-side, shuffle is
  O(partitions × 1 row), then a tiny unpivot. No explode, no string
  materialization.
- ``violations`` — explode of the packed check array, pre-filtered to
  failures; message/value strings are computed ONLY for failing rows (the
  ``when(ok, null)`` guard in Check.as_struct).
- ``annotate``  — the input plus a ``_valid`` boolean and the packed array,
  for pipelines that quarantine bad rows inline.

Reference lifecycle being re-expressed: validator.ValidateJSON →
validateCompiledSchema (/root/reference/validator/validator.go:289-549), with
ValidationResult{Valid, Errors} (:557-560) becoming DataFrames.
"""

from __future__ import annotations

from dataclasses import replace as _dc_replace
from typing import Callable, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jsonschema_validator_spark.errors import VIOLATION_FIELDS
from jsonschema_validator_spark.rules.base import Check, SpecError
from jsonschema_validator_spark.spec import CompiledSpec, Spec, ValidationMode

CHECKS_COL = "_checks"
VALID_COL = "_valid"


def unpivot_verdicts(agged, checks, group_cols, non_fatal: bool):
    """Explode an aggregated frame's per-rule failure sums (columns
    ``_n, _f0.._f{R-1}``) into long verdict rows — THE one copy of the
    verdict unpivot, shared by the batch ``verdicts()`` and the streaming
    ``windowed_verdicts`` (they had drifted: the batch copy gained the
    zero-checks guard, the streaming copy did not).

    rule_id/tag are literals baked into the projection — no side meta
    DataFrame, no broadcast join (plan ANALYSIS is a per-query driver
    cost, and the join bought nothing). ``non_fatal`` keeps pass=true
    (the engine-native option; warn mode does NOT soften verdicts — the
    reference never branches on ModeWarn, validator.go:507/806).
    """
    entries = [
        F.struct(
            F.lit(c.rule_id).alias("rule_id"),
            F.lit(c.tag).alias("tag"),
            F.col(f"_f{i}").alias("n_failed"),
        )
        for i, c in enumerate(checks)
    ]
    exploded = agged.select(
        *group_cols, F.col("_n"), F.explode(F.array(*entries)).alias("_v")
    )
    return exploded.select(
        *group_cols,
        F.col("_v.rule_id").alias("rule_id"),
        F.col("_v.tag").alias("tag"),
        F.col("_n").alias("n_checked"),
        F.col("_v.n_failed").alias("n_failed"),
        (F.lit(True) if non_fatal else (F.col("_v.n_failed") == 0)).alias("pass"),
    )


def _root_column(check: Check) -> Optional[str]:
    """Root table column a compiled check targets, parsed from its rule_id
    (``<keyword>:$.<col>[...]``). Used to scope the custom-hook guard."""
    _, _, p = check.rule_id.partition(":")
    if not p.startswith("$."):
        return None
    rest = p[2:]
    for i, ch in enumerate(rest):
        if ch in ".[":
            return rest[:i]
    return rest


class Validator:
    """Compiles a Spec against a DataFrame and evaluates it.

    Analogue of validator.New + Validate* (/root/reference/validator/
    validator.go:40-57, 289-316), with options mirroring options.go:
    ``stop_on_first_error`` (options.go:71-75) limits violation output to the
    first failing check per row; ``enable_caching`` ≙ WithCaching
    (options.go:57-61) memoizes spec compilation per input schema.
    """

    def __init__(
        self,
        spec: Union[Spec, dict, str],
        mode: Union[str, ValidationMode, None] = None,
        stop_on_first_error: bool = False,
        enable_caching: bool = False,
        non_fatal_verdicts: bool = False,
    ):
        if isinstance(spec, Spec):
            # a prebuilt Spec carries its own mode; silently ignoring a
            # CONFLICTING explicit mode here would leave the caller in the
            # wrong mode with no signal
            if mode is not None:
                # same error contract as the Spec path: an invalid mode
                # string raises SpecError, not a bare ValueError
                try:
                    coerced = ValidationMode(
                        mode.value if isinstance(mode, ValidationMode) else mode
                    )
                except ValueError:
                    raise SpecError(f"invalid mode: {mode!r}") from None
            if mode is not None and coerced != spec.mode:
                raise SpecError(
                    f"conflicting modes: Spec was built with "
                    f"mode={spec.mode.value!r} but Validator got mode={mode!r} "
                    "— rebuild the Spec with the desired mode"
                )
            self.spec = spec
        else:
            self.spec = Spec(spec, mode=mode)
        self.stop_on_first_error = stop_on_first_error
        self.enable_caching = enable_caching
        # engine-native (NOT reference parity): report n_failed but keep
        # pass=true — audit/monitoring pipelines that must never gate. The
        # reference's ModeWarn does NOT do this (it's never branched on:
        # validator.go:507/806 check only ModeStrict), so this is a separate
        # option rather than a mode semantics.
        self.non_fatal_verdicts = non_fatal_verdicts
        self._compile_cache: dict[str, CompiledSpec] = {}
        self._custom_validate_func: Optional[Callable[[Column, str], Column]] = None
        self._custom_type_func: Optional[Callable[[Column], Column]] = None

    # ---- extension points (validator.go:120-131) --------------------------

    def set_custom_validate_func(self, fn: Callable[[Column, str], Column]) -> None:
        """SetCustomValidateFunc analogue (validator.go:129-131, applied at
        :181-204): ``fn(col, path) -> boolean Column`` runs BEFORE every rule
        predicate on each spec column. Failing rows emit a violation with the
        reference's hardcoded message quirk ("value must start with
        'ADMIN_'", :195) and SKIP that column's remaining checks (the Go loop
        ``continue``s to the next field). A NULL result counts as a failure
        (the Go fn receives nil and returns false for non-strings)."""
        self._custom_validate_func = fn

    def set_custom_type_func(self, fn: Callable[[Column], Column]) -> None:
        """SetCustomTypeFunc analogue (validator.go:120-122, applied at
        :176-178): a column pre-projection applied to every spec column
        before predicates compile — the vectorized form of the reflect.Value
        extraction override (e.g. unwrap a struct wrapper field)."""
        self._custom_type_func = fn

    def clear_cache(self) -> None:
        """ClearCache analogue (validator.go:848-853)."""
        self._compile_cache.clear()

    # ---- compile + validate ----------------------------------------------

    def _spec_columns(self) -> list[str]:
        """Columns the spec references (properties ∪ required, spec order) —
        the analogue of 'fields with a non-empty tag' (validator.go:161-167)."""
        props = self.spec.raw.get("properties") or {}
        cols = list(props.keys())
        for r in self.spec.raw.get("required") or []:
            if r not in props:
                cols.append(r)
        return cols

    def compile(self, df: DataFrame) -> CompiledSpec:
        """Compile the spec against the DataFrame's schema. With
        ``enable_caching`` the compiled plan is memoized per input schema
        (validator.go:296-314 caches per schema string; inverted here — one
        Validator owns one spec and meets many schemas) and ``compile`` twice
        on the same schema returns the SAME object (CompileSchema cache test
        asserts pointer identity, validator_test.go:270-273)."""
        if not self.enable_caching:
            return self.spec.compile(df.schema)
        key = df.schema.json()
        hit = self._compile_cache.get(key)
        if hit is None:
            hit = self.spec.compile(df.schema)
            self._compile_cache[key] = hit
        return hit

    def validate(self, df: DataFrame) -> "ValidationResult":
        if self._custom_type_func is not None:
            projections = {
                c: self._custom_type_func(F.col(c))
                for c in self._spec_columns()
                if c in df.columns
            }
            if projections:
                df = df.withColumns(projections)
        compiled = self.compile(df)
        if self._custom_validate_func is not None:
            compiled = self._with_custom_checks(compiled, df)
        return ValidationResult(
            df,
            compiled,
            stop_on_first_error=self.stop_on_first_error,
            non_fatal_verdicts=self.non_fatal_verdicts,
        )

    def _with_custom_checks(self, compiled: CompiledSpec, df: DataFrame) -> CompiledSpec:
        """Prepend a per-column custom check and guard every later check so a
        custom failure suppresses it (validator.go:181-204 order)."""
        hooked: list[Check] = []
        fails: dict[str, Column] = {}
        for c in self._spec_columns():
            if c not in df.columns:
                continue
            path = f"$.{c}"
            try:
                ok = self._custom_validate_func(F.col(c), path)
            except Exception as exc:  # the fn-returned-error branch (:183-190)
                raise SpecError(f"custom validation failed: {exc}") from exc
            ok = F.coalesce(ok, F.lit(False))
            fails[c] = ~ok
            hooked.append(
                Check(
                    rule_id=f"custom:{path}",
                    tag="custom",
                    path=path,
                    predicate=ok,
                    # hardcoded in the reference regardless of the hook's
                    # actual semantics — validator.go:195
                    message="value must start with 'ADMIN_'",
                    value=F.col(c).cast("string"),
                    column_name=c,
                )
            )
        guarded = [
            _dc_replace(ch, predicate=fails[col] | ch.predicate)
            if (col := _root_column(ch)) in fails
            else ch
            for ch in compiled.checks
        ]
        return CompiledSpec(compiled.spec, hooked + guarded)


class ValidationResult:
    """Lazy handle over the validated DataFrame (nothing executes until an
    action — the three views share the one compiled plan)."""

    def __init__(
        self,
        df: DataFrame,
        compiled: CompiledSpec,
        stop_on_first_error: bool = False,
        non_fatal_verdicts: bool = False,
    ):
        self.df = df
        self.compiled = compiled
        self.stop_on_first_error = stop_on_first_error
        self.non_fatal_verdicts = non_fatal_verdicts

    # ---- row-level views -------------------------------------------------

    def row_valid(self) -> Column:
        pred = F.lit(True)
        for c in self.compiled.checks:
            pred = pred & c.predicate
        return pred

    def annotate(self, with_checks: bool = False) -> DataFrame:
        out = self.df.withColumn(VALID_COL, self.row_valid())
        if with_checks:
            out = out.withColumn(CHECKS_COL, self._checks_array())
        return out

    def valid_rows(self) -> DataFrame:
        return self.df.filter(self.row_valid())

    def invalid_rows(self) -> DataFrame:
        return self.df.filter(~self.row_valid())

    def _checks_array(self) -> Column:
        return F.array(*[c.as_struct() for c in self.compiled.checks])

    # ---- violations ------------------------------------------------------

    def violations(self, include: Optional[Sequence[str]] = None) -> DataFrame:
        """Violation rows ``(path, message, value, tag, param)`` — the
        reference's ValidationError shape (errors/errors.go:24-39) — plus
        any passthrough key columns requested via ``include``.

        With ``stop_on_first_error`` only the FIRST failing check per row is
        emitted (options.go:71-75 short-circuit semantics); check order is
        spec order, with ``required`` first (validator.go:327-353).
        """
        include = list(include or [])
        if not self.compiled.checks:
            # zero compiled checks (e.g. spec of standalone if/then/else
            # no-ops) — empty violation set with the stable 5-column
            # schema, derived FROM self.df (filter-false + literals) so a
            # STREAMING input still returns a streaming frame
            # (createDataFrame([]) here broke writeStream on the
            # documented violations-stream surface)
            lits = [
                F.lit(None).cast("string").alias(f) for f in VIOLATION_FIELDS
            ]
            return self.df.filter(F.lit(False)).select(*include, *lits)
        checks = self._checks_array()
        failed = F.filter(checks, lambda c: ~c["ok"])
        if self.stop_on_first_error:
            failed = F.slice(failed, 1, 1)
        src = self.df.select(*include, F.explode(failed).alias("_v"))
        cols = [F.col(f"_v.{f}").alias(f) for f in VIOLATION_FIELDS]
        return src.select(*include, *cols)

    # ---- verdicts ----------------------------------------------------------

    def verdicts(
        self,
        partition_by: Optional[Union[str, Sequence[str]]] = None,
        use_spark_partition_id: bool = False,
    ) -> DataFrame:
        """Per-partition, per-rule pass/fail verdicts.

        Output: ``[partition cols…,] rule_id, tag, n_checked, n_failed,
        pass``. One aggregation pass: each rule contributes a single
        ``sum(cast(!pred as long))`` — map-side partial agg, then a driver-
        free unpivot of the R sums into long form via a literal map.
        """
        if isinstance(partition_by, str):
            partition_by = [partition_by]
        if not self.compiled.checks:
            # zero compiled checks — mirror the violations() early-return
            # (F.array() of no entries is array<null>, which breaks the
            # unpivot's field extraction). Stable verdict schema, no rows,
            # derived from self.df so streaming inputs stay streaming.
            sel = [F.col(c) for c in (partition_by or [])]
            if use_spark_partition_id:
                sel.append(F.spark_partition_id().alias("partition_id"))
            sel += [
                F.lit(None).cast("string").alias("rule_id"),
                F.lit(None).cast("string").alias("tag"),
                F.lit(None).cast("long").alias("n_checked"),
                F.lit(None).cast("long").alias("n_failed"),
                F.lit(None).cast("boolean").alias("pass"),
            ]
            return self.df.filter(F.lit(False)).select(*sel)
        group_cols = [F.col(c) for c in (partition_by or [])]
        df = self.df
        if use_spark_partition_id:
            df = df.withColumn("_pid", F.spark_partition_id())
            group_cols.append(F.col("_pid"))

        aggs = [F.count(F.lit(1)).alias("_n")]
        for i, c in enumerate(self.compiled.checks):
            aggs.append(F.sum((~c.predicate).cast("long")).alias(f"_f{i}"))
        agged = df.groupBy(*group_cols).agg(*aggs) if group_cols else df.agg(*aggs)

        base_cols = [c for c in (partition_by or [])] + (
            ["_pid"] if use_spark_partition_id else []
        )
        out = unpivot_verdicts(
            agged, self.compiled.checks, base_cols, self.non_fatal_verdicts
        )
        if use_spark_partition_id:
            out = out.withColumnRenamed("_pid", "partition_id")
        return out

    # ---- scalar summary (driver-side; small) -------------------------------

    def summary(self) -> dict:
        """Table-level ValidationResult{Valid, error count} analogue."""
        row = (
            self.df.agg(
                F.count(F.lit(1)).alias("n"),
                # coalesce: F.sum over zero rows is NULL, which would flip
                # "valid" to False for an empty (vacuously valid) table
                F.coalesce(
                    F.sum((~self.row_valid()).cast("long")), F.lit(0)
                ).alias("bad"),
            )
        ).collect()[0]
        return {
            "valid": row["bad"] == 0,
            "n_rows": row["n"],
            "n_invalid_rows": row["bad"],
            "n_rules": len(self.compiled.checks),
        }
