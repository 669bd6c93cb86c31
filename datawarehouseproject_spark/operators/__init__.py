"""Relational / dataflow operators.

Set-based re-expressions of every operator the reference executes
(SURVEY.md §2) plus the large-scale training-data operators (dedup,
similarity search, text analysis, multimodal plumbing) the reference
lacks. All operators are DataFrame -> DataFrame: lazily planned, no
``collect()``, no driver-side loops.
"""

from .clean import clean_products  # noqa: F401
from .scd2 import Scd2Result, scd2_apply  # noqa: F401
from .dims import upsert_dim, latest_per_key  # noqa: F401
from .snapshot import daily_snapshot  # noqa: F401
from .rollups import monthly_rollup, quarterly_rollup, midrange  # noqa: F401
from .topk import top1_per_group, topk_per_group  # noqa: F401
from .dedup import (  # noqa: F401
    exact_dedup,
    fingerprint_dedup,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash64,
    ngram_jaccard_pairs,
    embedding_near_dup_pairs,
    corpus_dedup,
)
from .graph import connected_components  # noqa: F401
from .sampling import deterministic_split, weighted_sample  # noqa: F401
from .similarity import (  # noqa: F401
    brute_force_topk,
    lsh_bucketed_topk,
    ivf_index,
    ivf_topk,
    kmeans_refine,
    sign_lsh_bucket,
)
from .asof import asof_join  # noqa: F401
from .ranges import range_join  # noqa: F401
from .skew import salted_join  # noqa: F401
from .ids import dense_ids  # noqa: F401
from .multimodal import extract_media_features, documents_as_media  # noqa: F401
from .sketches import hll_distinct, hll_estimate, hll_sketch  # noqa: F401
from .sketches import cms_estimate, cms_sketch  # noqa: F401
from .merge import merge_into  # noqa: F401
from .quality_gate import assert_expectations, check_expectations  # noqa: F401
