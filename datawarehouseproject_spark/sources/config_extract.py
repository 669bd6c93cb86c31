"""Config-driven column extraction (S1 semantics).

The reference's crawler is driven by a per-site selector config
table — each row maps output columns to CSS selectors
(``crawl.py:126-262``; config table ``db_control_sql.sql:10-30``).
The engine-side semantic worth keeping (SURVEY §2.1 S1) is
*config-as-data driving the projection*: a mapping table decides
which raw expressions feed which output columns, so adding a source
is a config row, not a code change.

``config_driven_select`` applies one site's mapping (output column ->
SQL expression over the raw payload); ``extract_all_sites`` unions
every configured site's extraction — the multi-site union (U1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def config_driven_select(
    raw: DataFrame, mapping: dict[str, str], site_id: int | None = None
) -> DataFrame:
    """Project ``raw`` through a config mapping of
    ``output_col -> SQL expression``."""
    out = raw.selectExpr(*[f"{expr} AS {col}" for col, expr in mapping.items()])
    if site_id is not None:
        out = out.withColumn("ID_CONFIG", F.lit(site_id))
    return out


def extract_all_sites(
    raw_by_site: dict[int, DataFrame], configs: dict[int, dict[str, str]]
) -> DataFrame:
    """Union the per-site extractions (same output schema by
    construction — the config declares it)."""
    outs = [
        config_driven_select(raw_by_site[sid], configs[sid], site_id=sid)
        for sid in sorted(configs)
        if sid in raw_by_site
    ]
    result = outs[0]
    for df in outs[1:]:
        result = result.unionByName(df)
    return result
