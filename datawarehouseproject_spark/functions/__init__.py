"""Column-expression library (zero row-at-a-time UDFs).

Everything the reference computes with SQL scalar functions or Python
row loops (SURVEY.md §2.7) is re-expressed here as built-in
``pyspark.sql.functions`` expressions so it stays inside whole-stage
codegen on the JVM.
"""

from .cleaning import (  # noqa: F401
    clean_price,
    clean_screen_size,
    clean_gb,
    null_repair,
    junk_row_filter,
    sentinel_least,
    sentinel_greatest,
)
from .brands import brand_ladder  # noqa: F401
from .dates import date_dim  # noqa: F401
from .text import (  # noqa: F401
    normalize_text,
    token_count,
    word_tokens,
    char_ngrams,
    quality_score,
    language_id,
    fingerprint64,
)
from .vectors import cosine_similarity, dot_product, l2_norm  # noqa: F401
from .hashing import md5_long, hash_bucket  # noqa: F401
