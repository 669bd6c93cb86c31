"""Run-ledger guards: mutex handoff, once-per-day idempotency,
config-driven extraction."""

from __future__ import annotations

import datetime

from datawarehouseproject_spark.plans.ledger import SUCCESS, RunLedger
from datawarehouseproject_spark.sources.config_extract import (
    config_driven_select,
    extract_all_sites,
)


def test_acquire_release_handoff(spark, tmp_path):
    lg = RunLedger(spark, str(tmp_path / "log"))
    assert lg.acquire("transform") is True       # free -> claimed
    assert lg.acquire("transform") is False      # busy -> WAITING
    lg.release("transform", SUCCESS, {"rows": 239})
    assert lg.acquire("transform") is True       # released -> claimable
    lg.release("transform", SUCCESS)


def test_succeeded_today_guard(spark, tmp_path):
    lg = RunLedger(spark, str(tmp_path / "log2"))
    assert not lg.succeeded_today("mart")
    lg.log("mart", SUCCESS, "done")
    assert lg.succeeded_today("mart")
    assert not lg.succeeded_today("mart", datetime.date(2000, 1, 1))


def test_config_driven_extract_union(spark):
    raw1 = spark.createDataFrame([("iPhone 15|34.990.000đ",)], ["card"])
    raw2 = spark.createDataFrame([("Galaxy;27.990.000đ",)], ["card"])
    configs = {
        1: {"TEN": "split_part(card, '|', 1)", "GIA": "split_part(card, '|', 2)"},
        2: {"TEN": "split_part(card, ';', 1)", "GIA": "split_part(card, ';', 2)"},
    }
    out = extract_all_sites({1: raw1, 2: raw2}, configs)
    got = {r["TEN"]: (r["GIA"], r["ID_CONFIG"]) for r in out.collect()}
    assert got == {
        "iPhone 15": ("34.990.000đ", 1),
        "Galaxy": ("27.990.000đ", 2),
    }
