"""format keyword — 9 built-in formats + pluggable custom formats.

Reference: /root/reference/rules/format.go (dispatch table :16-26, error
shape :69-78 — message ``"invalid %s format"``, Tag="format", Param=format)
and the predicate impls in /root/reference/rules/utils.go:151-210.

Each format compiles to a JVM-side Column predicate (rlike / try_to_* —
whole-stage codegen, no Python in the hot path). Documented divergences from
the Go stdlib parsers are pinned by tests:

- email: Go uses net/mail.ParseAddress (full RFC5322, accepts display names
  and dotless domains). We use an RFC-lite regex accepting ``local@domain``
  with optional display-name form — matches the reference on its own test
  corpus (rules/format_test.go).
- uri: Go url.ParseRequestURI accepts absolute URIs and rooted paths; regex
  approximation below.
- hostname regex: verbatim from utils.go:188 (portable RE2∩Java).
- uuid regex: verbatim from utils.go:208.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

from jsonschema_validator_spark.rules.base import (
    Check,
    CompileContext,
    SpecError,
    builtin,
    null_passes,
)

_HOSTNAME_RE = (
    r"^([a-zA-Z0-9]|[a-zA-Z0-9][a-zA-Z0-9\-]{0,61}[a-zA-Z0-9])"
    r"(\.([a-zA-Z0-9]|[a-zA-Z0-9][a-zA-Z0-9\-]{0,61}[a-zA-Z0-9]))*$"
)
_UUID_RE = r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"
# Go net.ParseIP rejects leading zeros in dotted-quad (since Go 1.17).
_IPV4_OCTET = r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
_IPV4_RE = rf"^({_IPV4_OCTET}\.){{3}}{_IPV4_OCTET}$"
# Pragmatic IPv6: full, ::-compressed, and IPv4-mapped forms.
_H = r"[0-9a-fA-F]{1,4}"
_IPV6_RE = (
    rf"^({_H}:){{7}}{_H}$"
    rf"|^({_H}:){{1,7}}:$"
    rf"|^:((:{_H}){{1,7}}|:)$"
    rf"|^({_H}:){{1,6}}:{_H}$"
    rf"|^({_H}:){{1,5}}(:{_H}){{2}}$"
    rf"|^({_H}:){{1,4}}(:{_H}){{3}}$"
    rf"|^({_H}:){{1,3}}(:{_H}){{4}}$"
    rf"|^({_H}:){{1,2}}(:{_H}){{5}}$"
    rf"|^{_H}:(:{_H}){{6}}$"
    rf"|^::([fF]{{4}}:)?({_IPV4_OCTET}\.){{3}}{_IPV4_OCTET}$"
    rf"|^({_H}:){{1,4}}:({_IPV4_OCTET}\.){{3}}{_IPV4_OCTET}$"
)
_EMAIL_RE = r"^[^@\s]+@[^@\s]+$"
_URI_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*:[^ \t\r\n]*$|^/[^ \t\r\n]*$"
_DATETIME_RE = (
    r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?(Z|z|[+-]\d{2}:\d{2})$"
)
_DATE_RE = r"^\d{4}-\d{2}-\d{2}$"
_TIME_RE = r"^([01][0-9]|2[0-3]):[0-5][0-9]:[0-5][0-9]$"


def _fmt_email(col: Column) -> Column:
    return col.rlike(_EMAIL_RE)


def _fmt_date_time(col: Column) -> Column:
    # regex pins RFC3339 shape; try_to_timestamp pins field ranges
    return col.rlike(_DATETIME_RE) & F.try_to_timestamp(
        F.regexp_replace(col, r"(Z|z|[+-]\d{2}:\d{2})$", "")
    ).isNotNull()


def _fmt_date(col: Column) -> Column:
    return col.rlike(_DATE_RE) & F.try_to_date(col, "yyyy-MM-dd").isNotNull()


def _fmt_time(col: Column) -> Column:
    return col.rlike(_TIME_RE)


def _fmt_uri(col: Column) -> Column:
    return col.rlike(_URI_RE)


def _fmt_hostname(col: Column) -> Column:
    return (F.octet_length(col) <= 255) & (F.octet_length(col) > 0) & col.rlike(_HOSTNAME_RE)


def _fmt_ipv4(col: Column) -> Column:
    return col.rlike(_IPV4_RE)


def _fmt_ipv6(col: Column) -> Column:
    return col.rlike(_IPV6_RE)


def _fmt_uuid(col: Column) -> Column:
    return F.lower(col).rlike(_UUID_RE)


# analogue of formatValidatorMap (format.go:16-26)
FORMAT_VALIDATORS: dict[str, Callable[[Column], Column]] = {
    "email": _fmt_email,
    "date-time": _fmt_date_time,
    "date": _fmt_date,
    "time": _fmt_time,
    "uri": _fmt_uri,
    "hostname": _fmt_hostname,
    "ipv4": _fmt_ipv4,
    "ipv6": _fmt_ipv6,
    "uuid": _fmt_uuid,
}


def register_format_validator(name: str, fn: Optional[Callable[[Column], Column]]) -> None:
    """Custom format extension point (format.go:84-88)."""
    if fn is not None:
        FORMAT_VALIDATORS[name] = fn


@builtin("format")
def compile_format(col: Column, spec_value, path: str, ctx: CompileContext) -> list[Check]:
    if not isinstance(spec_value, str):
        raise SpecError("format must be a string")
    fmt_fn = FORMAT_VALIDATORS.get(spec_value)
    if fmt_fn is None:
        # unknown format: strict ⇒ every row fails with "unknown format: %s"
        # (format.go:54-65); loose ⇒ pass (format.go:66)
        if ctx.mode == "loose":
            pred = F.lit(True)
            msg = F.lit(None).cast("string")
        else:
            pred = null_passes(col, F.lit(False))
            msg = F.lit(f"unknown format: {spec_value}")
        return [
            Check(
                rule_id=f"format:{path}",
                tag="format",
                path=path,
                predicate=pred,
                message=msg,
                value=col.cast("string"),
                param=spec_value,
            )
        ]
    is_string = ctx.dtype is None or ctx.dtype.startswith("string")
    if not is_string:
        pred = null_passes(col, F.lit(False))
        msg = F.lit("value must be a string")  # format.go:44-49
    else:
        pred = null_passes(col, fmt_fn(col))
        msg = F.lit(f"invalid {spec_value} format")  # format.go:73
    return [
        Check(
            rule_id=f"format:{path}",
            tag="format",
            path=path,
            predicate=pred,
            message=msg,
            value=col.cast("string"),
            param=spec_value,
        )
    ]
