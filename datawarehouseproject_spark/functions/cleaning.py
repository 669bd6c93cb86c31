"""Cleaning projection expressions (reference parity).

Re-expresses the reference's ``SP_ETL_CLEAN_DATA`` stored procedure
(``/root/reference/sql_script/db_staging.sql:4883-4920``) as Catalyst
column expressions. Semantics preserved exactly (SURVEY.md §2.9):

- missing strings -> ``'Unknown'``; missing numerics -> ``-1``;
  unmatched date keys -> ``0`` (sentinels, not NULLs);
- price strings stripped of ``. , ₫ đ`` then cast DECIMAL(18,2)
  (``db_staging.sql:4896-4901``);
- screen size regex-extracted ``[0-9]*\\.?[0-9]+`` then cast
  DECIMAL(4,2) (``db_staging.sql:4902-4904``);
- RAM/storage strip ``GB`` + whitespace then integer cast — note the
  deliberate ``'1 TB' -> 1`` quirk (``db_staging.sql:4905-4908``);
- junk-row filter ``LENGTH(TEN)+LENGTH(LINK)+LENGTH(LINK_ANH) > 10``
  with NULL->'' (``db_staging.sql:4914``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Junk the reference strips from price strings: thousands separators
#: '.' and ',', plus regular and non-breaking spaces
#: (db_staging.sql:4897 — note it does NOT strip the currency sign;
#: MySQL's CAST parses the leading numeric prefix and ignores the
#: trailing '₫'/'đ').
PRICE_JUNK = "[.,\\s ]"
LEADING_NUM_RE = r"^-?[0-9]+"
DECIMAL_RE = r"[0-9]*\.?[0-9]+"
MISSING_NUM = -1
MISSING_STR = "Unknown"
MISSING_DATE_KEY = 0
SCD_OPEN = "9999-12-31"


def null_repair(col: Column | str, missing: str = MISSING_STR) -> Column:
    """``IFNULL(NULLIF(col,''), 'Unknown')`` (db_staging.sql:4893-4895)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.nullif(c, F.lit("")), F.lit(missing))


def clean_price(col: Column | str) -> Column:
    """Dirty price string -> DECIMAL(18,2); NULL/''/'-1' -> -1.

    ``IF(col IS NULL OR col='' OR col='-1', -1,
    COALESCE(CAST(REPLACE(...) AS DECIMAL(18,2)), -1))``
    (db_staging.sql:4896-4901). MySQL's CAST parses the leading
    numeric prefix of the stripped string and yields 0 for pure
    garbage (never NULL), so ``'34.990.000đ' -> 34990000.00`` and
    ``'abc' -> 0.00`` — both reproduced here with a leading-number
    extract defaulting to 0.
    """
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, PRICE_JUNK, "")
    leading = F.nullif(F.regexp_extract(stripped, LEADING_NUM_RE, 0), F.lit(""))
    # try_cast + saturation: MySQL CAST saturates out-of-range values
    # to the type maximum (warning, not error); Spark 4 ANSI mode
    # would abort the job instead.
    parsed = F.coalesce(
        F.coalesce(leading, F.lit("0")).try_cast("decimal(18,2)"),
        F.lit("9999999999999999.99").cast("decimal(18,2)"),
    )
    return F.when(
        c.isNull() | (c == "") | (c == "-1"), F.lit(MISSING_NUM).cast("decimal(18,2)")
    ).otherwise(parsed)


def clean_screen_size(col: Column | str) -> Column:
    """Screen-size string -> DECIMAL(4,2) via decimal regex extract.

    ``COALESCE(CAST(REGEXP_SUBSTR(col,'[0-9]*\\.?[0-9]+') AS
    DECIMAL(4,2)), -1)`` (db_staging.sql:4902-4904); missing -> -1.
    Unlike the price battery (plain CAST, where MySQL parses garbage
    to 0), REGEXP_SUBSTR yields NULL on no match and CAST(NULL) stays
    NULL, so a non-empty digitless string ('inch') also lands on the
    -1 sentinel via the COALESCE. This is the *intended* decimal
    extract ('6.9 inches' -> 6.90); the deployed reference's pattern
    observably matched only the integer part (6.00 at
    db_staging.sql:4638) — a documented divergence (SURVEY.md §2.7).
    """
    c = F.col(col) if isinstance(col, str) else col
    extracted = F.nullif(F.regexp_extract(c, DECIMAL_RE, 0), F.lit(""))
    # saturate >=100 to DECIMAL(4,2) max like MySQL (ANSI Spark would
    # raise); no-match stays NULL -> -1 through the COALESCE
    parsed = F.coalesce(
        extracted.try_cast("decimal(4,2)"),
        F.when(extracted.isNotNull(), F.lit("99.99").cast("decimal(4,2)")),
        F.lit(MISSING_NUM).cast("decimal(4,2)"),
    )
    return F.when(
        c.isNull() | (c == ""), F.lit(MISSING_NUM).cast("decimal(4,2)")
    ).otherwise(parsed)


def clean_gb(col: Column | str) -> Column:
    """RAM/storage string -> INT: strip ``GB`` + whitespace, cast.

    (db_staging.sql:4905-4908). MySQL ``CAST(... AS SIGNED)`` parses
    the leading digits, so ``'1 TB' -> 1`` (quirk 6) and garbage -> 0;
    NULL/'' -> -1.
    """
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, r"GB|\s| ", "")
    leading_int = F.nullif(F.regexp_extract(stripped, LEADING_NUM_RE, 0), F.lit(""))
    # try_cast: digit runs beyond int range saturate (MySQL-style)
    # instead of aborting under ANSI mode
    parsed = F.coalesce(
        leading_int.try_cast("int"),
        F.when(leading_int.isNotNull(), F.lit(2147483647)),
        F.lit(0),
    )
    return F.when(c.isNull() | (c == ""), F.lit(MISSING_NUM)).otherwise(parsed)


def junk_row_filter(
    name: Column | str, link: Column | str, img: Column | str, min_len: int = 10
) -> Column:
    """Keep rows with combined identity length > 10 (db_staging.sql:4914)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in (name, link, img)]
    total = sum(
        (F.length(F.coalesce(c, F.lit(""))) for c in cols), F.lit(0)
    )
    return total > min_len


def _nullif_missing(col: Column) -> Column:
    """Treat the -1 sentinel (and NULL) as missing for min/max math."""
    return F.nullif(col, F.lit(MISSING_NUM))


def sentinel_least(a: Column | str, b: Column | str, default=None) -> Column:
    """Per-row MIN of two prices where -1/NULL mean missing.

    Mirrors the 4-branch Python case in ``load_dwh.py:166-184``:
    both missing -> NULL (the reference stores None in DIM_PRODUCT),
    one missing -> the other, else least(). (``least`` skips NULLs in
    both Spark and ANSI SQL.) Pass ``default=-1`` for sentinel-out.
    """
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    out = F.least(_nullif_missing(ca), _nullif_missing(cb))
    return out if default is None else F.coalesce(out, F.lit(default))


def sentinel_greatest(a: Column | str, b: Column | str, default=None) -> Column:
    """Per-row MAX of two prices; -1/NULL mean missing (load_dwh.py:166-184)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    out = F.greatest(_nullif_missing(ca), _nullif_missing(cb))
    return out if default is None else F.coalesce(out, F.lit(default))
