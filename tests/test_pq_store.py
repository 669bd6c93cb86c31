"""Persisted PQ index (operators/similarity.py: pq_encode,
pq_code_dedup, PQCodeStore) — the codes-table composition (round 8):
train -> encode -> persist -> serve, with the served ADC results
pinned byte-for-byte against the in-DAG ``pq_adc_topk``."""

from __future__ import annotations

import pytest

from tests.test_pq import _toy_emb


def test_encode_codes_cover_every_vector_once(spark):
    from datawarehouseproject_spark.operators.similarity import pq_encode

    emb = _toy_emb(spark)
    codes, cent = pq_encode(emb, dim=8, m=2, k=4, rounds=2)
    rows = codes.collect()
    assert len(rows) == 40
    assert {r["vec_id"] for r in rows} == set(range(40))
    for r in rows:
        assert 0 <= r["code0"] < 4 and 0 <= r["code1"] < 4
    assert cent.count() == 2 * 4 * 4


def test_code_dedup_groups_equal_code_words(spark):
    from datawarehouseproject_spark.operators.similarity import (
        pq_code_dedup,
        pq_encode,
    )

    emb = _toy_emb(spark)
    codes = {
        r["vec_id"]: (r["code0"], r["code1"])
        for r in pq_encode(emb, dim=8, m=2, k=4, rounds=2)[0].collect()
    }
    groups: dict = {}
    for vid, cw in codes.items():
        groups.setdefault(cw, []).append(vid)
    expect = {
        min(v): (len(v), ",".join(str(x) for x in sorted(v)))
        for v in groups.values()
        if len(v) >= 2
    }
    got = {
        r["rep_vec_id"]: (r["n_members"], r["member_ids"])
        for r in pq_code_dedup(emb, dim=8, m=2, k=4, rounds=2).collect()
    }
    assert got == expect
    assert expect, "toy corpus must actually produce duplicate codes"


def test_store_roundtrip_and_served_adc_matches_in_dag(spark, tmp_path):
    """The durable artifact serves the SAME ranking as the in-DAG
    composition: write (codebook, codes), reload, ADC-probe — every
    (id, distance, rank) must equal pq_adc_topk's output."""
    from datawarehouseproject_spark.operators.similarity import (
        PQCodeStore,
        pq_adc_topk,
        pq_encode,
    )

    emb = _toy_emb(spark)
    codes, cent = pq_encode(emb, dim=8, m=2, k=4, rounds=2)
    store = PQCodeStore(spark, str(tmp_path / "pqidx"))
    store.write(codes, cent)
    # a fresh load must not depend on the in-memory frames
    query = emb.filter("vec_id = 0")
    served = {
        r["vec_id"]: (r["adc_sqdist"], r["rank"])
        for r in store.adc_topk(query, dim=8, m=2, topk=10).collect()
    }
    indag = {
        r["vec_id"]: (r["adc_sqdist"], r["rank"])
        for r in pq_adc_topk(
            emb, dim=8, m=2, k=4, rounds=2, query_id=0, topk=10
        ).collect()
    }
    assert served == indag
    assert len(served) == 10
    # the store's parquet layout is the real artifact
    assert (tmp_path / "pqidx" / "codes").exists()
    assert (tmp_path / "pqidx" / "codebook").exists()
