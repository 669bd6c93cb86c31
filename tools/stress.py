"""Scale stress harness: the training-data operators at ~1M docs.

Amplifies the sf0.1 tables (unique ids, perturbed content so dedup
stays non-trivial) and measures wall time + throughput for the
operators whose cost profile changes with volume: minhash LSH,
simhash, exact dedup, text battery, embedding near-dup, IVF topk.

Usage: python tools/stress.py [amplification] [sf_dir]
Prints one JSON line per operator.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    amp = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from datawarehouseproject_spark.session import get_spark
    from datawarehouseproject_spark.catalog import load_table
    from datawarehouseproject_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        simhash64,
    )
    from datawarehouseproject_spark.operators.similarity import ivf_topk
    from datawarehouseproject_spark.functions.text import (
        language_id,
        quality_score,
        token_count,
    )

    spark = get_spark("stress")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    docs0 = load_table(spark, sf_dir, "documents")
    n0 = docs0.count()
    # amplification: unique ids; ~30% of copies keep the original text
    # (real near-dups for LSH to find), the rest get a per-copy suffix
    copies = spark.range(amp).withColumnRenamed("id", "copy")
    docs = (
        docs0.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("copy") * n0).alias("doc_id"),
            F.when(F.col("copy") % 3 == 0, F.col("text")).otherwise(
                F.concat(F.col("text"), F.lit(" v"), F.col("copy").cast("string"))
            ).alias("text"),
        )
        .repartition(64)
        .cache()
    )
    n_docs = docs.count()

    emb0 = load_table(spark, sf_dir, "embeddings")
    e0 = emb0.count()
    emb = (
        emb0.crossJoin(copies)
        .select(
            (F.col("vec_id") + F.col("copy") * e0).alias("vec_id"),
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x: x + F.col("copy") * 0.001,
            ).alias("embedding"),
        )
        .repartition(64)
        .cache()
    )
    n_emb = emb.count()

    def run(name, df, unit_count):
        # noop sink: forces full column evaluation (a bare count()
        # lets Catalyst prune the projections away)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        n_out = df.count()
        print(json.dumps({
            "op": name, "input_rows": unit_count, "output_rows": n_out,
            "sec": round(dt, 2),
            "rows_per_sec": int(unit_count / dt) if dt else None,
        }))

    run("text_battery", docs.select(
        "doc_id", token_count("text"), quality_score("text"), language_id("text")
    ), n_docs)
    deduped = exact_dedup(docs).cache()
    run("exact_dedup", deduped, n_docs)
    n_dedup = deduped.count()
    run("simhash", simhash64(docs), n_docs)
    # production shape: near-dup LSH AFTER exact dedup, with the
    # mega-bucket guard (this corpus is pathologically self-similar)
    run(
        "minhash_lsh_pairs_post_dedup",
        minhash_lsh_pairs(deduped, max_bucket_size=100),
        n_dedup,
    )
    queries = emb.filter(F.col("vec_id") < 64).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    run("ivf_topk_64q", ivf_topk(emb, queries, n_centroids=32, nprobe=4, k=10), n_emb)

    # SCD2 at volume: bootstrap a history from the amplified corpus,
    # then a day-2 batch where ~1/3 of rows changed and 5% are new.
    from datawarehouseproject_spark.operators.scd2 import scd2_apply

    st1 = docs.select(
        F.col("doc_id").alias("ID"),
        F.concat(F.lit("d"), F.col("doc_id").cast("string")).alias("TEN"),
        F.concat(F.lit("L"), F.col("doc_id").cast("string")).alias("LINK"),
        F.lit("img").alias("LINK_ANH"),
        (F.col("doc_id") % 1000).cast("decimal(18,2)").alias("GIA_CU"),
        (F.col("doc_id") % 900).cast("decimal(18,2)").alias("GIA_MOI"),
        F.lit(6.5).cast("decimal(4,2)").alias("KICH_THUOC_MAN_HINH"),
        F.lit(8).alias("RAM"),
        F.lit(256).alias("BO_NHO"),
    ).cache()
    st1.count()
    t0 = time.time()
    r1 = scd2_apply(st1, None, now="2024-01-01 00:00:00")
    h1 = r1.history.localCheckpoint()
    boot = time.time() - t0
    st2 = st1.withColumn(
        "GIA_MOI",
        F.when(F.col("ID") % 3 == 0, F.col("GIA_MOI") + 50).otherwise(
            F.col("GIA_MOI")
        ),
    )
    t0 = time.time()
    r2 = scd2_apply(st2, h1, now="2024-01-02 00:00:00")
    n_hist = r2.history.count()
    day2 = time.time() - t0
    print(json.dumps({
        "op": "scd2_day2", "input_rows": n_docs, "history_rows": n_hist,
        "bootstrap_sec": round(boot, 2), "day2_sec": round(day2, 2),
        "rows_per_sec": int(n_docs / day2),
    }))

    # MERGE at volume: CDC feed touching ~38% of the target (1/3
    # updates, 5% inserts, flagged deletes on every 50th key)
    from datawarehouseproject_spark.operators.merge import merge_into

    tgt = docs.select(
        F.col("doc_id").alias("k"), (F.col("doc_id") % 997).alias("v")
    ).cache()
    tgt.count()
    upd = tgt.filter(F.col("k") % 3 == 0).select(
        "k", (F.col("v") + 1).alias("v"), (F.col("k") % 50 == 0).alias("is_del")
    )
    ins = spark.range(n_docs * 10, n_docs * 10 + n_docs // 20).select(
        F.col("id").alias("k"), F.lit(0).alias("v"),
        F.lit(False).alias("is_del"),
    )
    run(
        "merge_cdc",
        merge_into(tgt, upd.unionByName(ins), on=["k"],
                   update_cols=["v"], delete_col="is_del"),
        n_docs,
    )

    # sketches at volume: the shuffle carries <=2^p / depth*width rows
    # however large the input
    from datawarehouseproject_spark.operators.sketches import (
        cms_sketch,
        hll_distinct,
    )

    run("hll_distinct", hll_distinct(docs, "doc_id", p=12), n_docs)
    run("cms_sketch", cms_sketch(docs, "doc_id", depth=4, width=1024), n_docs)

    from datawarehouseproject_spark.operators.sketches import (
        quantile_estimate,
        quantile_sketch,
    )

    run(
        "quantile_sketch",
        quantile_estimate(
            quantile_sketch(docs.withColumn("v", (F.col("doc_id") % 100000).cast("double")),
                            "v", "doc_id", k=1024),
            [1, 25, 50, 75, 99],
        ),
        n_docs,
    )


if __name__ == "__main__":
    main()
