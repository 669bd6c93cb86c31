"""Brand-extraction ladder (reference parity).

``load_dwh.py:141-153`` classifies a product name by the first brand
token it contains (ordered — a name with both 'iphone' and 'samsung'
is Apple; SURVEY.md §2.9 quirk 10). Re-expressed as one ordered
``when`` chain, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (token, brand) pairs in the reference's ladder order
#: (load_dwh.py:144-153).
BRAND_LADDER = (
    ("iphone", "Apple"),
    ("samsung", "Samsung"),
    ("xiaomi", "Xiaomi"),
    ("oppo", "OPPO"),
    ("vivo", "Vivo"),
    ("realme", "Realme"),
    ("nokia", "Nokia"),
    ("asus", "ASUS"),
)

DEFAULT_BRAND = "Khác"


def brand_ladder(
    name_col: Column | str,
    ladder: tuple[tuple[str, str], ...] = BRAND_LADDER,
    default: str = DEFAULT_BRAND,
) -> Column:
    """Ordered contains-ladder over the lowercased name."""
    c = F.col(name_col) if isinstance(name_col, str) else name_col
    lowered = F.lower(c)
    expr: Column | None = None
    for token, brand in ladder:
        cond = lowered.contains(token)
        expr = F.when(cond, brand) if expr is None else expr.when(cond, brand)
    assert expr is not None
    return expr.otherwise(default)
