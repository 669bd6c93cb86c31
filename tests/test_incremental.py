"""Incremental dedup: correctness vs batch dedup + append-only index.

The incremental contract (mirrors the reference's daily SCD batch,
db_staging.sql:4929-4991 — only the day's rows are processed against
current history):

- a new batch deduped against the persisted index yields the same
  survivors as re-running the batch pipeline over history ∪ new,
  restricted to the new batch (no transitive chains in the fixture);
- appending a batch NEVER rewrites a historical index file
  (byte-untouched, checked by mtime_ns + size, like the SCD2
  closed-partition test).
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from datawarehouseproject_spark.operators.dedup import corpus_dedup
from datawarehouseproject_spark.operators.incremental import (
    DedupIndex,
    incremental_dedup,
    index_components,
)

PARAMS = dict(num_perm=16, shingle_len=5, bands=4)


@pytest.fixture()
def two_batches(spark):
    """History (even ids) + new batch (odd ids) with planted dups:
    exact dup of history, near-dup of history, near-dup pair within
    the new batch, and clean rows."""
    base = (
        "the quick brown fox jumps over the lazy dog while the band plays "
        "an old waltz in the rain and everyone watches quietly from the porch "
    )
    rows = []
    # history: 10 distinct docs
    for i in range(0, 20, 2):
        rows.append((i, base + f"history document number {i} " + base))
    # new batch (odd ids)
    rows.append((21, rows[0][1]))  # exact dup of history doc 0
    rows.append((23, base + "history document number 2 " + base + "x"))  # near-dup of 2
    rows.append((25, base + "fresh new content " + base))  # survivor, has near-dup 27
    rows.append((27, base + "fresh new content " + base + " y"))  # near-dup of 25
    rows.append((29, "a completely different short text about spark engines " * 4))
    rows.append((31, rows[-1][1]))  # exact dup within new batch (of 29)
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_matches_batch_dedup(spark, two_batches):
    docs = two_batches
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    idx = index_components(hist, **PARAMS)
    survivors, comp = incremental_dedup(new, idx, jaccard_threshold=0.8, **PARAMS)
    got = sorted(r.doc_id for r in survivors.select("doc_id").collect())
    # batch-equivalent: dedup history ∪ new, keep the new-batch slice
    batch = corpus_dedup(docs, jaccard_threshold=0.8, **PARAMS)
    want = sorted(
        r.doc_id for r in batch.filter(F.col("doc_id") % 2 == 1).collect()
    )
    assert got == want == [25, 29]
    # survivors' index rows cover exactly the survivors
    assert sorted(
        r.doc_id for r in comp.hashes.select("doc_id").distinct().collect()
    ) == [25, 29]


def test_index_append_only(spark, two_batches, tmp_path):
    docs = two_batches
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    idx = DedupIndex(spark, str(tmp_path / "dedup_index"))
    idx.build(hist, **PARAMS)

    def snapshot() -> dict[str, tuple[int, int]]:
        return {
            f: (os.stat(f).st_mtime_ns, os.stat(f).st_size)
            for part in ("hashes", "shingles", "bands")
            for f in glob.glob(os.path.join(idx.root, part, "*.parquet"))
        }

    before = snapshot()
    assert before, "index build produced no files"
    survivors = idx.add_batch(new, jaccard_threshold=0.8, **PARAMS)
    assert sorted(r.doc_id for r in survivors.select("doc_id").collect()) == [25, 29]
    after = snapshot()
    # every pre-existing file is byte-untouched; new files appended
    for f, sig in before.items():
        assert after[f] == sig, f"historical index file rewritten: {f}"
    assert len(after) > len(before)

    # the appended index answers the next batch: re-adding the same
    # docs (new ids) drops them all as dups of the now-indexed batch
    replay = new.withColumn("doc_id", F.col("doc_id") + 100)
    again = idx.add_batch(replay, jaccard_threshold=0.8, **PARAMS)
    assert again.count() == 0
