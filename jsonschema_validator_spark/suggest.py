"""Spec bootstrap: profile a DataFrame and emit a validation spec dict
that :class:`~jsonschema_validator_spark.spec.Spec` compiles as-is.

The standard data-quality loop (the pattern Deequ calls "constraint
suggestion"): profile a known-good corpus once, pin the suggested spec,
validate every future batch against it. The reference library has no
counterpart — this is an engine-native extension, but it emits ONLY
keywords the reference defines (type / required / minimum / maximum /
minLength / maxLength / minItems / maxItems / enum), so a suggested spec
round-trips through the same compile path as a hand-written one and, by
construction, passes on the corpus it was profiled from.

Execution shape (design-for-100 TB):

- **Pass 1 — ONE aggregate over one scan.** Every per-column statistic
  (null count, numeric min/max, string byte-length min/max, array size
  min/max, approx distinct) is a field of a single ``agg`` — partial
  aggregation reduces map-side, the exchange carries one row per task,
  the driver receives one row total.
- **Pass 2 — exact enum sets, only if candidates exist.** ``enum`` is
  suggested only for string columns (reference parity: ``enum`` is
  []string-only, rule.go:144-167). Candidates are pruned by pass 1's
  ``approx_count_distinct ≤ 2×enum_max_distinct`` (HLL error can't
  reach 2× at these cardinalities), then ONE more aggregate collects
  ``collect_set`` for candidate columns only — partial sets are bounded
  by the verified-low true cardinality, so no task ever holds more than
  ~2×enum_max_distinct values per column. The FINAL decision uses the
  exact set size, so an approx-vs-exact disagreement near the threshold
  can only skip pass-2 work, never change the suggestion.
- No shuffle other than the two 1-row aggregate reductions; the only
  ``collect()`` is O(columns) driver data.

What is deliberately NOT suggested: ``pattern`` (inferring regexes from
data is guesswork), ``format`` (a format that happens to match today's
corpus over-constrains tomorrow's), cross-field keywords. Temporal and
nested-object columns get ``type`` (+ ``required``) only.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jsonschema_validator_spark.rules.types import _json_type_of_dtype

_INT_DTYPES = frozenset(
    {"tinyint", "smallint", "int", "bigint", "long", "short", "byte"}
)


def _suggested_type(dtype: str) -> str:
    """Suggested ``type`` keyword for a Spark dtype. Integral dtypes get
    the tighter ``integer`` (every value is whole, and ``integer`` accepts
    whole-valued numbers — type.go:92-108), everything else the JSON type
    the reference would see. Exact-token membership, not a prefix test:
    ``interval day to second``.simpleString() also starts with ``int``."""
    if dtype in _INT_DTYPES:
        return "integer"
    return _json_type_of_dtype(dtype)


def suggest_spec(
    df: DataFrame,
    columns: Optional[list[str]] = None,
    enum_max_distinct: int = 8,
    widen_numeric: float = 0.0,
) -> dict:
    """Profile ``df`` and return a raw spec dict (``required`` +
    ``properties``) compilable by ``Spec(...)``.

    - ``required``: columns with zero NULLs in the corpus.
    - numeric: ``minimum`` / ``maximum`` = observed min/max, optionally
      widened by ``widen_numeric`` × (max − min) on each side (0.0 = pin
      exactly; 0.05 leaves 5% headroom for future batches).
    - string: ``minLength`` / ``maxLength`` in BYTES (octet_length — the
      Go ``len(string)`` convention the length keywords use), plus
      ``enum`` when the exact distinct count is ≤ ``enum_max_distinct``.
    - array: ``minItems`` / ``maxItems``.
    - temporal / struct / map: ``type`` only.

    An all-NULL column contributes ``type`` only (there is no evidence
    for value constraints, and ``required`` would instantly fail).
    """
    cols = columns or df.columns
    schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for c in cols:
        if c not in schema:
            raise ValueError(f"suggest_spec: no such column: {c}")

    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        dtype = schema[c]
        jtype = _json_type_of_dtype(dtype)
        aggs.append(F.count(F.col(c)).alias(f"nn__{c}"))
        if jtype == "number":
            # min/max computed in the native type (exact for decimals and
            # int64), cast to double only on the way out
            aggs.append(F.min(F.col(c)).cast("double").alias(f"min__{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"max__{c}"))
        elif jtype == "string" and not (
            dtype.startswith("timestamp") or dtype.startswith("date")
        ):
            aggs.append(F.min(F.octet_length(F.col(c))).alias(f"min__{c}"))
            aggs.append(F.max(F.octet_length(F.col(c))).alias(f"max__{c}"))
            aggs.append(F.approx_count_distinct(F.col(c)).alias(f"ad__{c}"))
        elif jtype == "array":
            aggs.append(F.min(F.size(F.col(c))).alias(f"min__{c}"))
            aggs.append(F.max(F.size(F.col(c))).alias(f"max__{c}"))
    row = df.agg(*aggs).collect()[0].asDict()

    candidates = [
        c
        for c in cols
        if f"ad__{c}" in row
        and row[f"nn__{c}"] > 0
        and row[f"ad__{c}"] <= 2 * enum_max_distinct
    ]
    enums: dict[str, list[str]] = {}
    if candidates:
        erow = (
            df.agg(
                *[
                    F.array_sort(F.collect_set(F.col(c))).alias(c)
                    for c in candidates
                ]
            )
            .collect()[0]
            .asDict()
        )
        for c in candidates:
            vals = erow[c] or []
            if 0 < len(vals) <= enum_max_distinct:
                enums[c] = list(vals)

    required = [c for c in cols if row[f"nn__{c}"] == row["_n"] and row["_n"] > 0]
    props: dict[str, dict] = {}
    for c in cols:
        dtype = schema[c]
        jtype = _json_type_of_dtype(dtype)
        p: dict = {"type": _suggested_type(dtype)}
        if row[f"nn__{c}"] > 0:
            if f"min__{c}" in row and row[f"min__{c}"] is not None:
                lo, hi = row[f"min__{c}"], row[f"max__{c}"]
                if jtype == "number":
                    pad = widen_numeric * (hi - lo)
                    p["minimum"], p["maximum"] = lo - pad, hi + pad
                elif jtype == "string":
                    p["minLength"], p["maxLength"] = int(lo), int(hi)
                elif jtype == "array":
                    p["minItems"], p["maxItems"] = int(lo), int(hi)
            if c in enums:
                p["enum"] = enums[c]
        props[c] = p
    return {"type": "object", "required": required, "properties": props}


# bound direction per keyword: raising a lower bound or lowering an upper
# bound TIGHTENS the constraint (fewer values pass); the reverse LOOSENS it.
_LOWER_BOUNDS = ("minimum", "minLength", "minItems")
_UPPER_BOUNDS = ("maximum", "maxLength", "maxItems")


def _bound_change(kw: str, old, new) -> Optional[str]:
    """Classify a numeric-bound transition. None = no change."""
    if old is None and new is None:
        return None
    if old is None:
        return "tightened"  # a bound appeared where there was none
    if new is None:
        return "loosened"  # an existing bound was dropped
    if new == old:
        return None
    if kw in _LOWER_BOUNDS:
        return "tightened" if new > old else "loosened"
    return "tightened" if new < old else "loosened"


def spec_diff(old: dict, new: dict) -> list[tuple]:
    """Diff two spec dicts (the ``suggest_spec`` shape: top-level
    ``required`` + flat ``properties``) into rows ``(column, keyword,
    old_num, new_num, old_str, new_str, change)`` — one row per constraint
    that CHANGED, nothing for constraints that held.

    ``change`` classification:

    - ``tightened`` — the new spec accepts a subset of what the old one
      did for this keyword: a lower bound rose, an upper bound fell, a
      bound/enum/required appeared where there was none, or an enum lost
      values.
    - ``loosened`` — the reverse: a bound relaxed or disappeared, a column
      stopped being required, an enum gained values.
    - ``changed`` — neither direction is a subset: ``type`` switched, or
      an enum both gained and lost values.

    Driver-side pure function — specs are O(columns) dicts, never data.
    Numeric keyword values go in ``old_num``/``new_num``; ``type``,
    ``required`` and comma-joined sorted enum sets in ``old_str``/
    ``new_str`` (the ``spec_keyword_rows`` convention)."""
    rows: list[tuple] = []
    op, np_ = old.get("properties", {}), new.get("properties", {})
    oreq, nreq = set(old.get("required", [])), set(new.get("required", []))
    for c in sorted(set(op) | set(np_)):
        po, pn = op.get(c, {}), np_.get(c, {})
        to, tn = po.get("type"), pn.get("type")
        if to != tn:
            change = "changed" if (to and tn) else (
                "tightened" if tn else "loosened"
            )
            rows.append((c, "type", None, None, to, tn, change))
        if (c in oreq) != (c in nreq):
            rows.append((
                c, "required", None, None,
                "true" if c in oreq else None,
                "true" if c in nreq else None,
                "tightened" if c in nreq else "loosened",
            ))
        for kw in _LOWER_BOUNDS + _UPPER_BOUNDS:
            vo, vn = po.get(kw), pn.get(kw)
            ch = _bound_change(kw, vo, vn)
            if ch is not None:
                rows.append((
                    c, kw,
                    None if vo is None else float(vo),
                    None if vn is None else float(vn),
                    None, None, ch,
                ))
        eo, en = po.get("enum"), pn.get("enum")
        if eo is not None or en is not None:
            so, sn = set(eo or []), set(en or [])
            if so != sn:
                if eo is None:
                    ch = "tightened"  # an enum constraint appeared
                elif en is None:
                    ch = "loosened"  # the enum constraint was dropped
                elif sn < so:
                    ch = "tightened"
                elif so < sn:
                    ch = "loosened"
                else:
                    ch = "changed"
                rows.append((
                    c, "enum", None, None,
                    ",".join(sorted(so)) if eo is not None else None,
                    ",".join(sorted(sn)) if en is not None else None,
                    ch,
                ))
    return rows


_DIFF_SCHEMA = (
    "column string, keyword string, old_num double, new_num double, "
    "old_str string, new_str string, change string"
)


def constraint_drift(
    df_old: DataFrame,
    df_new: DataFrame,
    columns: Optional[list[str]] = None,
    enum_max_distinct: int = 8,
    widen_numeric: float = 0.0,
) -> DataFrame:
    """Constraint drift between two corpus snapshots: profile each side
    with :func:`suggest_spec` and report every suggested constraint that
    tightened / loosened / changed between them — the monitoring loop that
    tells you yesterday's pinned spec no longer describes today's data
    BEFORE a validation run floods the quarantine sink.

    Execution shape (design-for-100 TB): two profile passes per side (one
    full aggregate + one pruned exact-enum aggregate — see
    :func:`suggest_spec`), each reducing to ONE driver row; the diff
    itself is a pure O(columns) driver-side function. No join, no shuffle
    beyond the four 1-row aggregate reductions, regardless of table size.
    """
    old = suggest_spec(df_old, columns, enum_max_distinct, widen_numeric)
    new = suggest_spec(df_new, columns, enum_max_distinct, widen_numeric)
    return df_old.sparkSession.createDataFrame(
        spec_diff(old, new), _DIFF_SCHEMA
    )


def spec_keyword_rows(spec: dict) -> list[tuple]:
    """Flatten a suggested spec into ``(column, keyword, value_num,
    value_str)`` rows — the display/gating projection. Numeric keyword
    values go in ``value_num`` (no float→string formatting ambiguity);
    ``type`` goes in ``value_str``; ``required`` is one row per required
    column (value_str 'true'); ``enum`` is one row per VALUE (value_str),
    in sorted order."""
    rows = []
    req = set(spec.get("required", []))
    for c, p in sorted(spec.get("properties", {}).items()):
        rows.append((c, "type", None, p["type"]))
        if c in req:
            rows.append((c, "required", None, "true"))
        for kw in (
            "minimum",
            "maximum",
            "minLength",
            "maxLength",
            "minItems",
            "maxItems",
        ):
            if kw in p:
                rows.append((c, kw, float(p[kw]), None))
        for v in p.get("enum", []):
            rows.append((c, "enum", None, v))
    return rows
