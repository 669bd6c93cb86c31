"""MySQL-dialect shim: execute the reference's own SQL texts.

The reference stores its transformation SQL as data and "compiles"
it at runtime (``transform_staging.py:24-58``; SURVEY.md §3.2). This
module is the engine-side equivalent: :func:`translate` rewrites the
MySQL dialect into Spark SQL so the *stored texts themselves* run on
the engine via ``spark.sql`` — verified bit-exact against the
reference's captured output in tests/test_reference_sql.py.

Dialect gaps handled:

- ``CAST(x AS SIGNED)`` -> BIGINT.
- **MySQL CAST leniency**: MySQL parses the leading numeric prefix
  of a string and yields 0 for garbage (never an error); Spark's
  ANSI CAST throws. Every CAST operand is wrapped in a
  NULL-preserving leading-number extraction with '0' fallback,
  reproducing MySQL semantics exactly. The wrapper skips non-string
  operand types only by virtue of numeric strings round-tripping
  through the regex unchanged.
- cross-schema names (``db_staging.DIM_DATE``) -> flat view names.

Not a general MySQL frontend — it covers the constructs the
reference's ``sql_commands`` registry actually uses (IFNULL/NULLIF/
IF/COALESCE/REPLACE/REGEXP_SUBSTR/LENGTH/DATE are already valid
Spark SQL).
"""

from __future__ import annotations

import re

#: MySQL numeric-prefix pattern (also consumes exponent-free
#: decimals): what CAST() reads before giving up.
_NUM_PREFIX = r"^-?[0-9]+(\\.[0-9]+)?"

_NUMERIC_TYPES = ("SIGNED", "UNSIGNED", "DECIMAL", "INT", "BIGINT", "DOUBLE", "FLOAT")


def _first_cast(sql: str) -> tuple[int, int, str, str] | None:
    """Locate the first (outermost) CAST(operand AS type), balanced.

    Returns (start, end, operand, type) or None.
    """
    m = re.search(r"\bCAST\s*\(", sql, flags=re.IGNORECASE)
    if not m:
        return None
    depth = 1
    i = m.end()
    operand_start = i
    as_pos = None
    while i < len(sql) and depth > 0:
        ch = sql[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 1 and as_pos is None and sql[i : i + 4].upper() == " AS ":
            as_pos = i
        i += 1
    if as_pos is None or depth != 0:
        return None
    return (m.start(), i, sql[operand_start:as_pos], sql[as_pos + 4 : i - 1].strip())


def _mysqlify_cast(operand: str, cast_type: str) -> str:
    """Rebuild one CAST with MySQL prefix-parse semantics."""
    ct = cast_type.upper()
    if ct == "SIGNED":
        cast_type = "BIGINT"
    elif ct == "UNSIGNED":
        cast_type = "BIGINT"
    if not any(ct.startswith(t) for t in _NUMERIC_TYPES):
        return f"CAST({operand} AS {cast_type})"
    lenient = (
        f"CASE WHEN ({operand}) IS NULL THEN NULL "
        f"ELSE coalesce(nullif(regexp_extract(CAST(({operand}) AS STRING), "
        f"'{_NUM_PREFIX}', 0), ''), '0') END"
    )
    return f"CAST({lenient} AS {cast_type})"


def _rewrite_casts(sql: str) -> str:
    """Bottom-up recursive rewrite: operand first (handles nested
    casts), then this cast, then the remainder of the text. Generated
    wrapper text is emitted, never re-scanned — guaranteed to
    terminate."""
    found = _first_cast(sql)
    if found is None:
        return sql
    start, end, operand, cast_type = found
    return (
        sql[:start]
        + _mysqlify_cast(_rewrite_casts(operand), cast_type)
        + _rewrite_casts(sql[end:])
    )


def translate(sql: str, view_renames: dict[str, str] | None = None) -> str:
    """MySQL-dialect SQL text -> Spark SQL."""
    out = sql
    # cross-schema table refs -> flat temp view names
    for old, new in (view_renames or {}).items():
        out = out.replace(old, new)
    return _rewrite_casts(out)
