"""Behavioral-analytics and entity-matching queries (round 5b).

Beyond-reference surface in the same spirit as ``queries_data.py``:
operators a warehouse team layers on the reference's marts once the
relational core exists (reference scope: ``load_datamart.py`` builds
sale/trend marts only — ref `load_datamart.py:60-158`). Everything
here is built-in column functions — zero Python UDFs — and every
query carries an exact DuckDB oracle.

Scale notes are per-query; the common theme is map-side-combinable
aggregation states (bitmap longs, counts) and blocked joins instead
of quadratic self-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table as _t
from .registry import register


def _utc(spark: SparkSession) -> None:
    from ..session import tune_session

    tune_session(spark)


@register(
    "entity_resolution",
    oracle="""
    SELECT DISTINCT
           least(a.c_custkey, b.c_custkey)    AS custkey_a,
           greatest(a.c_custkey, b.c_custkey) AS custkey_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS name_dist,
           round(abs(a.c_acctbal - b.c_acctbal), 2)     AS bal_diff
    FROM customer a
    JOIN customer b
      ON a.c_nationkey = b.c_nationkey
     AND a.c_custkey < b.c_custkey
    WHERE abs(a.c_acctbal - b.c_acctbal) <= 1.0
      AND levenshtein(a.c_name, b.c_name) <= 2
    """,
    tags=("entity-resolution", "fuzzy-join", "blocking", "levenshtein"),
)
def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching: candidate duplicate customer records
    (same nation, account balance within 1.0, name edit-distance <= 2).

    Scale design: the oracle's naive formulation is an O(n^2/25)
    within-nation self-join — quadratic and dead at 100 TB. The Spark
    plan uses *banded numeric blocking*: every record lands in bucket
    floor(acctbal); the probe side explodes to {bucket, bucket+1} so
    any pair within 1.0 of balance shares an equi-join key (floor is
    non-expansive, so |balance diff| <= 1.0 implies |bucket diff| <= 1).
    The join is then a plain shuffled equi-join on (nation, bucket)
    whose block sizes are bounded by balance locality, with the
    expensive ``levenshtein`` evaluated only inside blocks. Pairs that
    share a bucket are found in both probe directions, so the output
    canonicalizes with least/greatest + distinct.
    """
    _utc(spark)
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    build = c.withColumn("bucket", F.floor("c_acctbal").cast("bigint"))
    probe = build.withColumn(
        "probe", F.explode(F.array(F.col("bucket"), F.col("bucket") + F.lit(1)))
    )
    a, b = probe.alias("a"), build.alias("b")
    return (
        a.join(
            b,
            (F.col("a.probe") == F.col("b.bucket"))
            & (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.c_custkey") != F.col("b.c_custkey")),
        )
        .where(
            (F.abs(F.col("a.c_acctbal") - F.col("b.c_acctbal")) <= F.lit(1.0))
            & (F.levenshtein(F.col("a.c_name"), F.col("b.c_name")) <= F.lit(2))
        )
        .select(
            F.least(F.col("a.c_custkey"), F.col("b.c_custkey")).alias("custkey_a"),
            F.greatest(F.col("a.c_custkey"), F.col("b.c_custkey")).alias(
                "custkey_b"
            ),
            F.levenshtein(F.col("a.c_name"), F.col("b.c_name"))
            .cast("int")
            .alias("name_dist"),
            F.round(
                F.abs(F.col("a.c_acctbal") - F.col("b.c_acctbal")), 2
            ).alias("bal_diff"),
        )
        .distinct()
    )


@register(
    "bitmap_distinct_users",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY event_type
    """,
    tags=("bitmap", "exact-distinct", "roaring", "map-side-combine"),
)
def q_bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users per event type via bitmap aggregation
    (roaring-bitmap idea on builtin longs).

    ``count(DISTINCT x)`` shuffles every distinct (group, x) pair.
    For dense integer ids the bitmap form shuffles 63 ids per long:
    map ids to (chunk=id DIV 63, bit=id%63), OR the single-bit longs
    per (group, chunk) — ``bit_or`` is map-side combinable, so each
    partition emits at most one long per (group, chunk) — then sum
    ``bit_count`` per group. Same exact answer as the oracle's
    COUNT(DISTINCT), ~63x less shuffle on dense keys, and the
    per-chunk bitmaps are mergeable across days/shards like the HLL
    registers in ``operators/sketches.py`` (but exact). 63-bit chunks
    keep ``1 << bit`` inside a signed long on both engines.
    """
    _utc(spark)
    e = _t(spark, sf_dir, "events")
    chunks = (
        e.select(
            "event_type",
            F.expr("user_id DIV 63").alias("chunk"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))"
            ).alias("bit"),
        )
        .groupBy("event_type", "chunk")
        .agg(F.bit_or("bit").alias("bits"))
    )
    return chunks.groupBy("event_type").agg(
        F.sum(F.bit_count("bits")).cast("bigint").alias("n_users")
    )


@register(
    "event_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS next_type
        FROM events
    ), counted AS (
        SELECT event_type, next_type, count(*) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    )
    SELECT event_type, next_type, CAST(n AS BIGINT) AS n,
           CAST((10000 * n) // sum(n) OVER (PARTITION BY event_type)
                AS BIGINT) AS p_bp
    FROM counted
    """,
    tags=("sequence-mining", "markov", "window", "lead"),
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user event streams:
    for each (event_type -> next_type) pair, the count and the
    transition probability in integer basis points.

    ``lead`` over (user, time) needs one shuffle by user; the
    transition count is then a tiny |types|^2 aggregate. Probability
    is integer floor-division basis points ((10000*n) DIV total) so
    the value is bit-exact on both engines — no float division in the
    compared output. State per window partition is one row.
    """
    _utc(spark)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = _t(spark, sf_dir, "events").select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    counted = (
        seq.where(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return counted.select(
        "event_type",
        "next_type",
        F.col("n").cast("bigint").alias("n"),
        F.expr("CAST((10000 * n) DIV sum(n) OVER (PARTITION BY event_type) AS BIGINT)").alias(
            "p_bp"
        ),
    )


@register(
    "activity_gaps",
    oracle="""
    WITH seq AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               lag(CAST(ts AS DATE)) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS prev_day
        FROM events
    )
    SELECT user_id, prev_day AS gap_start, day AS gap_end,
           CAST(date_diff('day', prev_day, day) AS BIGINT) AS gap_days
    FROM seq
    WHERE prev_day IS NOT NULL
      AND date_diff('day', prev_day, day) >= 2
    """,
    tags=("time-series", "gap-detection", "lag"),
)
def q_activity_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn-risk gap detection: spans of >= 2 days between a user's
    consecutive events (the dual of ``forward_fill_series``, which
    fills gaps; this one reports them).

    One shuffle by user_id for the lag window (same partitioning the
    sessionize/funnel family uses — on a real pipeline these share a
    repartition); the gap filter happens before anything wide.
    """
    _utc(spark)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = _t(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("date").alias("day"),
        F.lag(F.col("ts").cast("date")).over(w).alias("prev_day"),
    )
    return seq.where(
        F.col("prev_day").isNotNull()
        & (F.datediff("day", "prev_day") >= F.lit(2))
    ).select(
        "user_id",
        F.col("prev_day").alias("gap_start"),
        F.col("day").alias("gap_end"),
        F.datediff("day", "prev_day").cast("bigint").alias("gap_days"),
    )


@register(
    "doc_length_histogram",
    oracle="""
    SELECT lang,
           CAST(length(bin(n_chars)) AS INT) AS bit_bucket,
           CAST(count(*) AS BIGINT)  AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang, bit_bucket
    """,
    tags=("histogram", "datasheet", "log-scale"),
)
def q_doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2 length histogram of the corpus per language — the
    power-of-two length distribution every dataset datasheet plots.

    The bucket is the integer *bit length* of n_chars, computed as
    ``length(bin(x))`` = floor(log2(x))+1 — pure integer/string
    builtins, so the bucket edge at exact powers of two is bit-exact
    on both engines (a float ``log2`` could flip floor() at 2^k).
    Map-side combinable aggregate over ~|langs|*40 groups; no window,
    no shuffle beyond the one partial/final agg exchange.
    """
    _utc(spark)
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("lang", F.length(F.bin("n_chars")).cast("int").alias("bit_bucket"), "n_chars")
        .groupBy("lang", "bit_bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


@register(
    "consistent_bottomk_sample",
    oracle="""
    WITH hashed AS (
      SELECT doc_id, lang, n_chars,
             md5(CAST(doc_id AS VARCHAR) || '-s1') AS h
      FROM documents),
    sample AS (
      SELECT * FROM hashed ORDER BY h, doc_id LIMIT 500)
    SELECT CAST(count(*) AS BIGINT) AS k_count,
           CAST(sum(n_chars) AS BIGINT) AS chars_sum,
           CAST(count(DISTINCT lang) AS INTEGER) AS n_langs,
           CAST(sum(doc_id) AS BIGINT) AS id_sum,
           max(h) AS threshold_hash
    FROM sample
    """,
    tags=("sampling", "bottom-k", "zero-udf", "reproducible"),
)
def q_consistent_bottomk_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CONSISTENT fixed-size sampling (round 10) — the property a
    training-data held-out set actually needs and ``rand()`` cannot
    give: the k documents with the SMALLEST ``md5(id || salt)`` are
    the same set on every rerun, every engine, every partitioning,
    and (because a superset corpus keeps the same k smallest until
    new ids hash below the threshold) the sample is STABLE as the
    corpus grows — the bottom-k sketch used as a sampler.  The plan
    is ``orderBy(hash).limit(k)``, which Spark executes as
    TakeOrderedAndProject: a per-partition top-k heap merged on the
    driver, NO full sort shuffle — exactly the distributed bottom-k
    mechanics, scaling by partitions at any corpus size.  md5 hex is
    byte-identical across Spark and DuckDB, so the oracle pins the
    SAME 500 documents (id_sum) and the same k-th threshold hash."""
    _utc(spark)
    docs = _t(spark, sf_dir, "documents")
    hashed = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit("-s1"))
        ).alias("h"),
    )
    sample = hashed.orderBy("h", "doc_id").limit(500)
    return sample.agg(
        F.count(F.lit(1)).cast("bigint").alias("k_count"),
        F.sum("n_chars").cast("bigint").alias("chars_sum"),
        F.countDistinct("lang").cast("int").alias("n_langs"),
        F.sum("doc_id").cast("bigint").alias("id_sum"),
        F.max("h").alias("threshold_hash"),
    )


@register(
    "stratified_sample",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, source, lang, n_chars,
               row_number() OVER (PARTITION BY source, lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents)
    SELECT doc_id, source, lang, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 50
    """,
    tags=("sampling", "stratified", "per-source-cap"),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum cap sampling: keep at most 50 documents per
    (source, lang), chosen by deterministic md5 rank — the standard
    "cap any one source's share of the training mix" operator
    (complements the proportional split in ``operators/sampling.py``).

    Deterministic (hash order, not rand()) so reruns and engines
    agree. One shuffle by the stratum key; the per-stratum window
    state is a counter, and rows past the cap short-circuit. At 100 TB
    the stratum count (sources × langs) is tiny vs rows, so skew is
    the per-stratum row count — for pathological mega-strata, pre-cap
    with a bucketed two-level rank before the exact window.
    """
    _utc(spark)
    from pyspark.sql import Window

    w = Window.partitionBy("source", "lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            "source",
            "lang",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.row_number().over(w).cast("bigint").alias("rk"),
        )
        .where(F.col("rk") <= 50)
    )


@register(
    "mad_outliers",
    oracle="""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS m
        FROM events GROUP BY event_type),
    dev AS (
        SELECT e.event_id, e.event_type, e.value, e.value - med.m AS dev
        FROM events e JOIN med USING (event_type)),
    mad AS (
        SELECT event_type, quantile_cont(abs(dev), 0.5) AS mad
        FROM dev GROUP BY event_type)
    SELECT d.event_id, d.event_type,
           round(d.value, 4) AS value,
           round(abs(d.dev), 4) AS abs_dev,
           round(mad.mad, 4)  AS mad
    FROM dev d JOIN mad USING (event_type)
    WHERE abs(d.dev) > 3 * mad.mad
    """,
    tags=("outliers", "mad", "robust-stats", "quality"),
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: events whose value deviates from the
    per-type median by more than 3 median-absolute-deviations. MAD is
    the standard robust scale estimate (a z-score's mean/stddev are
    themselves dragged by the outliers being hunted).

    Two exact interpolated medians per group (Spark ``percentile`` ==
    ANSI quantile_cont, the `percentiles` query's proven pairing),
    each a single agg over ~|types| groups; both per-type stat frames
    are broadcast back against events, so the fact table is scanned
    twice but never shuffled.
    """
    _utc(spark)
    e = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("m")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "value",
        (F.col("value") - F.col("m")).alias("dev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(abs(dev), 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .where(F.abs(F.col("dev")) > 3 * F.col("mad"))
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            F.round(F.abs(F.col("dev")), 4).alias("abs_dev"),
            F.round("mad", 4).alias("mad"),
        )
    )


@register(
    "orders_yoy",
    oracle="""
    WITH monthly AS (
        SELECT CAST(year(o_orderdate) AS INT)  AS yr,
               CAST(month(o_orderdate) AS INT) AS mo,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM orders GROUP BY yr, mo)
    SELECT yr, mo, revenue_cents,
           revenue_cents - lag(revenue_cents, 12)
               OVER (ORDER BY yr, mo) AS yoy_delta_cents
    FROM monthly
    """,
    tags=("time-series", "yoy", "period-over-period"),
)
def q_orders_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year monthly revenue growth — the period-comparative
    report every sales mart ships (the reference's trend mart stops at
    plain monthly sums, ref `load_datamart.py:100-130`).

    Money is summed in integer CENTS (prices carry exactly 2 decimals,
    so round(x*100) is integer-exact) — the cross-engine float-sum
    accumulation-order problem does not exist here, and the 12-month
    lag subtraction stays exact. The unpartitioned lag window runs
    over the ALREADY-AGGREGATED frame (one row per month — dozens of
    rows at any data scale), so the single-partition window is not a
    scale hazard; the heavy lifting is the map-side-combinable
    monthly sum.
    """
    _utc(spark)
    from pyspark.sql import Window

    monthly = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.month("o_orderdate").cast("int").alias("mo"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("revenue_cents")
        )
    )
    w = Window.orderBy("yr", "mo")
    return monthly.select(
        "yr",
        "mo",
        "revenue_cents",
        (F.col("revenue_cents") - F.lag("revenue_cents", 12).over(w)).alias(
            "yoy_delta_cents"
        ),
    )


@register(
    "pareto_frontier",
    oracle="""
    SELECT p.p_partkey,
           round(p.p_retailprice, 2) AS price,
           CAST(p.p_size AS INT)     AS size
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice
          AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice
               OR q.p_size > p.p_size))
    """,
    tags=("skyline", "pareto", "dominance"),
)
def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline: parts that are Pareto-optimal on (cheap price,
    large size) — no other part is at-most-as-expensive AND
    at-least-as-large with one strict. Records with identical
    (price, size) don't dominate each other, so co-optimal ties all
    survive.

    The oracle states dominance as the quadratic NOT EXISTS; the
    Spark plan is the sort-scan skyline: collapse to one row per
    DISTINCT price (max size + that max's tie count), prefix-max
    sizes in price order, keep prices whose max size strictly beats
    every cheaper price's, then join back for the surviving rows.
    The prefix-max over the price-level frame uses the two-stage
    range-partitioned ``running_max`` (``operators/ids.py``) — at
    extreme price cardinality no single task ever holds more than
    one range's worth of distinct prices.
    """
    _utc(spark)
    from ..operators.ids import running_max

    p = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    # one row per distinct price: the best (max) size at that price
    per_price = p.groupBy("p_retailprice").agg(
        F.max("p_size").alias("smax")
    )
    frontier_prices = (
        running_max(per_price, "p_retailprice", "smax", out_col="prev_max")
        .where(F.col("prev_max").isNull() | (F.col("smax") > F.col("prev_max")))
        .select(F.col("p_retailprice").alias("fp_price"), "smax")
    )
    # surviving rows: at a frontier price, exactly the max-size ties
    return (
        p.join(
            F.broadcast(frontier_prices),
            (F.col("p_retailprice") == F.col("fp_price"))
            & (F.col("p_size") == F.col("smax")),
        )
        .select(
            "p_partkey",
            F.round("p_retailprice", 2).alias("price"),
            F.col("p_size").cast("int").alias("size"),
        )
    )


@register(
    "equi_depth_histogram",
    oracle="""
    WITH bounds AS (
        SELECT quantile_cont(l_extendedprice,
                   [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS bs
        FROM lineitem),
    assigned AS (
        SELECT l.l_extendedprice AS v,
               1 + len(list_filter(b.bs, x -> x < l.l_extendedprice))
                   AS bucket
        FROM lineitem l, bounds b)
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(v), 2) AS lo,
           round(max(v), 2) AS hi
    FROM assigned GROUP BY bucket
    """,
    tags=("histogram", "equi-depth", "optimizer-stats"),
)
def q_equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-height) 8-bucket histogram of
    l_extendedprice — the optimizer-statistics / data-profiling
    primitive. Bucket k holds values between the (k-1)/8 and k/8
    quantiles; ties land in the lower bucket on both engines because
    assignment counts strictly-smaller boundaries.

    Scale shape: ONE aggregate computes all seven interpolated
    boundaries, the 7-element boundary array rides along as a
    broadcast scalar subquery, and assignment + counting are
    map-side combinable. No global sort — the naive equi-depth via
    ntile() would single-partition the whole table.

    The exact ``percentile()`` here buffers every value in one
    aggregation state — fine at test SF, a single-point memory
    hazard at 100 TB; `equi_depth_histogram_sketch` is the SAME plan
    with the boundary aggregate swapped for the bottom-k quantile
    sketch (≤k rows shuffled regardless of input), and
    ``tests/test_sketches.py`` pins the two within depth tolerance.
    """
    _utc(spark)
    li = _t(spark, sf_dir, "lineitem").select("l_extendedprice")
    bounds = li.agg(
        F.expr(
            "percentile(l_extendedprice,"
            " array(0.125D, 0.25D, 0.375D, 0.5D, 0.625D, 0.75D, 0.875D))"
        ).alias("bs")
    )
    return _equi_depth_assign(li, bounds)


def _equi_depth_assign(li: DataFrame, bounds: DataFrame) -> DataFrame:
    """Shared equi-depth tail: broadcast the 1-row boundary array,
    assign each value the count of strictly-smaller boundaries + 1,
    then a map-side-combinable (bucket → n, lo, hi) aggregate."""
    assigned = li.crossJoin(F.broadcast(bounds)).select(
        F.col("l_extendedprice").alias("v"),
        (
            F.lit(1)
            + F.size(
                F.filter("bs", lambda x: x < F.col("l_extendedprice"))
            )
        )
        .cast("int")
        .alias("bucket"),
    )
    return assigned.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.min("v"), 2).alias("lo"),
        F.round(F.max("v"), 2).alias("hi"),
    )


def _equi_depth_sketch_oracle() -> str:
    from ..operators.sketches import sql_equi_depth_bounds

    bounds = sql_equi_depth_bounds(
        "lineitem",
        "l_extendedprice",
        "CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)",
        n_buckets=8,
        k=1024,
    )
    return f"""
    WITH bounds AS ({bounds}),
    assigned AS (
        SELECT l.l_extendedprice AS v,
               1 + len(list_filter(b.bs, x -> x < l.l_extendedprice))
                   AS bucket
        FROM lineitem l, bounds b)
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(v), 2) AS lo,
           round(max(v), 2) AS hi
    FROM assigned GROUP BY bucket
    """


@register(
    "equi_depth_histogram_sketch",
    oracle=_equi_depth_sketch_oracle(),
    tags=("histogram", "equi-depth", "sketch", "bottom-k"),
)
def q_equi_depth_histogram_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`equi_depth_histogram`'s 100 TB path: identical assignment and
    counting plan, but the 7 boundaries come from the deterministic
    bottom-k quantile sketch (``operators/sketches.py``) instead of
    the exact ``percentile()`` aggregate. The sketch's aggregation
    state is ≤k (hash, value) pairs — constant memory at any input
    size — where exact percentile buffers EVERY value in one
    aggregation buffer. Rows are sampled uniformly by hashing the
    (l_orderkey, l_linenumber) primary key, so the sample (and hence
    every boundary) is bitwise-reproducible on any engine: the DuckDB
    oracle recomputes the same bottom-1024 sample and hash-matches
    the bucket counts exactly."""
    _utc(spark)
    from ..operators.sketches import equi_depth_bounds, quantile_sketch

    li = _t(spark, sf_dir, "lineitem").select(
        "l_extendedprice",
        F.concat_ws(
            "-",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
        ).alias("rid"),
    )
    sk = quantile_sketch(li, "l_extendedprice", "rid", k=1024)
    bounds = equi_depth_bounds(sk, n_buckets=8)
    return _equi_depth_assign(li.select("l_extendedprice"), bounds)


@register(
    "user_paths",
    oracle="""
    WITH paths AS (
        SELECT user_id,
               array_to_string(
                   list(event_type ORDER BY ts, event_id)[1:3], '>') AS path
        FROM events GROUP BY user_id)
    SELECT path, CAST(count(*) AS BIGINT) AS n_users
    FROM paths GROUP BY path
    """,
    tags=("clickstream", "path-analysis", "collect-list"),
)
def q_user_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream path analysis: each user's first three event types
    joined into an ordered path, counted across users — the onboarding
    funnel's raw material (which openings lead anywhere).

    ``collect_list(struct(ts, event_id, event_type))`` + ``array_sort``
    orders INSIDE the aggregation buffer, so per-user paths need no
    window and no secondary sort — one shuffle by user, then a tiny
    path-count aggregate. Per-group state is bounded by that user's
    events; the struct sort is bytewise-deterministic (ts, then
    event_id tiebreak).
    """
    _utc(spark)
    e = _t(spark, sf_dir, "events")
    paths = (
        e.groupBy("user_id")
        .agg(
            F.array_join(
                F.slice(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct("ts", "event_id", "event_type")
                            )
                        ),
                        lambda x: x["event_type"],
                    ),
                    1,
                    3,
                ),
                ">",
            ).alias("path")
        )
    )
    return paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )


@register(
    "table_checksum",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           bit_xor(CAST('0x' || substring(md5(
               CAST(l_orderkey AS VARCHAR) || '|' ||
               CAST(l_linenumber AS VARCHAR) || '|' ||
               CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR)
               || '|' ||
               CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) || '|' ||
               CAST(CAST(l_shipdate AS DATE) AS VARCHAR)
           ), 1, 15) AS BIGINT)) AS xor_hash,
           CAST(sum(l_orderkey) AS BIGINT) AS sum_key
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("checksum", "reconciliation", "anti-entropy"),
)
def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table fingerprint per partition key — the
    replica-reconciliation / migration-verification primitive: equal
    (n_rows, xor_hash, sum_key) on two copies proves them identical
    without moving data.

    XOR of per-row 60-bit md5 keys is commutative+associative, so the
    checksum is insensitive to row order and partitioning and combines
    map-side; floats enter the hash as integer cents and timestamps
    as date strings, so the representation is engine-stable. Verifying
    a 100 TB copy costs one scan per side and shuffles |groups| rows.
    """
    _utc(spark)
    li = _t(spark, sf_dir, "lineitem")
    row_repr = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.round(F.col("l_extendedprice") * 100)
        .cast("bigint")
        .cast("string"),
        F.col("l_quantity").cast("bigint").cast("string"),
        F.col("l_shipdate").cast("date").cast("string"),
    )
    row_hash = F.conv(F.substring(F.md5(row_repr), 1, 15), 16, 10).cast("long")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.bit_xor(row_hash).alias("xor_hash"),
        F.sum("l_orderkey").cast("bigint").alias("sum_key"),
    )


@register(
    "late_arriving_dim_repair",
    oracle="""
    WITH dim AS (
      SELECT * FROM customer WHERE c_custkey % 97 <> 0),
    conformed AS (
      SELECT coalesce(d.c_custkey, 0) AS custkey_conformed,
             coalesce(d.c_nationkey, -1) AS nation_conformed,
             o.o_totalprice
      FROM orders o LEFT JOIN dim d ON o.o_custkey = d.c_custkey)
    SELECT CAST(nation_conformed AS BIGINT) AS nation_conformed,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price,
           CAST(sum(CASE WHEN custkey_conformed = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_repaired
    FROM conformed GROUP BY nation_conformed
    """,
    tags=("data-quality", "late-arriving-dimension", "sentinel", "repair"),
)
def q_late_arriving_dim_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REPAIR counterpart to `referential_audit`'s report: facts
    whose dimension row hasn't arrived yet (simulated by withholding
    every 97th customer) are conformed to the 0/-1 sentinel member
    instead of being dropped or failing the load — the reference's
    own sentinel move (SURVEY §2.9: -1/'Unknown'/0 members) as the
    standard late-arriving-dimension pattern. Revenue is conserved
    by construction: every order lands in exactly one bucket, orphans
    visibly pooled under the sentinel nation for later
    re-attribution. One broadcast dim join + a map-side-combinable
    aggregate in exact DECIMAL — no fact-table shuffle beyond the
    final dim-sized groupBy."""
    _utc(spark)
    orders = _t(spark, sf_dir, "orders")
    dim = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 97 != 0)
    conformed = orders.join(
        F.broadcast(dim), orders["o_custkey"] == dim["c_custkey"], "left"
    ).select(
        F.coalesce(F.col("c_custkey"), F.lit(0)).alias("custkey_conformed"),
        F.coalesce(F.col("c_nationkey"), F.lit(-1))
        .cast("bigint")
        .alias("nation_conformed"),
        "o_totalprice",
    )
    return conformed.groupBy("nation_conformed").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
        F.sum((F.col("custkey_conformed") == 0).cast("bigint"))
        .cast("bigint")
        .alias("n_repaired"),
    )


@register(
    "referential_audit",
    oracle="""
    SELECT 'orders_without_customer' AS check_name,
           CAST(count(*) AS BIGINT)  AS n_violations
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL
    UNION ALL
    SELECT 'lineitem_without_order',
           CAST(count(*) AS BIGINT)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IS NULL
    UNION ALL
    SELECT 'customer_invalid_nation',
           CAST(count(*) AS BIGINT)
    FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE n.n_nationkey IS NULL
    UNION ALL
    SELECT 'supplier_invalid_nation',
           CAST(count(*) AS BIGINT)
    FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_nationkey IS NULL
    """,
    tags=("data-quality", "referential-integrity", "anti-join"),
)
def q_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table referential-integrity audit: orphan counts for the
    star schema's four foreign-key edges — the relationship-level
    complement of the row-level rule battery in
    ``operators/quality_gate.py``.

    Each check is an anti join + count. Nation (25 rows) and customer
    broadcast; lineitem->orders is the one genuinely big-big edge and
    stays a shuffled semi/anti join on the 8-byte key — at 100 TB
    that's one co-partitionable shuffle, or free if both tables are
    bucketed by orderkey (``sources/bucketed.py``).
    """
    _utc(spark)

    def orphans(name, child, child_key, parent, parent_key):
        return (
            child.join(
                parent, child[child_key] == parent[parent_key], "left_anti"
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
            .select(F.lit(name).alias("check_name"), "n_violations")
        )

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    return (
        orphans("orders_without_customer", o, "o_custkey", c, "c_custkey")
        .unionByName(
            orphans("lineitem_without_order", li, "l_orderkey", o, "o_orderkey")
        )
        .unionByName(
            orphans("customer_invalid_nation", c, "c_nationkey", n, "n_nationkey")
        )
        .unionByName(
            orphans("supplier_invalid_nation", s, "s_nationkey", n, "n_nationkey")
        )
    )


@register(
    "monthly_price_ohlc",
    oracle="""
    WITH px AS (
      SELECT l_partkey,
             date_trunc('month', CAST(l_shipdate AS DATE)) AS month,
             l_extendedprice AS p,
             (CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
              * 1000000000000)
               + l_orderkey * 100 + l_linenumber AS ord
      FROM lineitem WHERE l_partkey % 50 = 0)
    SELECT l_partkey, month,
           round(arg_min(p, ord), 2) AS open,
           round(max(p), 2) AS high,
           round(min(p), 2) AS low,
           round(arg_max(p, ord), 2) AS close,
           CAST(count(*) AS BIGINT) AS n_trades
    FROM px GROUP BY l_partkey, month
    """,
    tags=("time-series", "resample", "ohlc", "min_by-max_by"),
)
def q_monthly_price_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part monthly OHLC resample (the financial candlestick
    shape applied to shipment prices): open/close are the price at
    the earliest/latest (shipdate, orderkey, linenumber) — a TOTAL
    order, so `min_by`/`max_by` are deterministic and the DuckDB
    `arg_min`/`arg_max` twin picks the identical rows (the order key
    is composed into one BIGINT — days*10^12 + orderkey*100 +
    linenumber — because arg_min takes scalar keys; valid while
    orderkey < 10^10, far past TPC-H SF 1000); high/low are
    plain min/max. ONE aggregation pass — no window sort, no
    self-join: min_by/max_by keep a single (key, value) pair of
    running state per group, so the resample is map-side combinable
    and scales like any other groupBy, where the naive
    first/last-via-window formulation pays a full per-group sort.
    Filtered to every 50th part to keep the output bench-sized; the
    plan is identical without the filter."""
    _utc(spark)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_partkey") % 50 == 0)
    ordk = (
        F.datediff(F.to_date("l_shipdate"), F.lit("1970-01-01")).cast("long")
        * F.lit(1_000_000_000_000)
        + F.col("l_orderkey") * 100
        + F.col("l_linenumber")
    )
    return (
        li.select(
            "l_partkey",
            F.date_trunc("month", F.to_date("l_shipdate"))
            .cast("date")
            .alias("month"),
            F.col("l_extendedprice").alias("p"),
            ordk.alias("ord"),
        )
        .groupBy("l_partkey", "month")
        .agg(
            F.round(F.min_by("p", "ord"), 2).alias("open"),
            F.round(F.max("p"), 2).alias("high"),
            F.round(F.min("p"), 2).alias("low"),
            F.round(F.max_by("p", "ord"), 2).alias("close"),
            F.count("*").cast("bigint").alias("n_trades"),
        )
    )


@register(
    "time_weighted_avg",
    oracle="""
    WITH spans AS (
        SELECT user_id, value,
               floor(epoch(lead(ts) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id)))::BIGINT
               - floor(epoch(ts))::BIGINT AS dt_secs
        FROM events)
    SELECT user_id,
           CAST(sum(dt_secs) AS BIGINT) AS span_secs,
           round(sum(value * dt_secs) / sum(dt_secs), 4) AS twap
    FROM spans
    WHERE dt_secs IS NOT NULL AND dt_secs > 0
    GROUP BY user_id
    """,
    tags=("time-series", "twap", "time-weighted"),
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP): each observation
    weighted by how long it was 'current' (seconds until the next
    event) — the right average for irregularly-sampled series, where
    the plain mean over-weights bursts.

    Weights are INTEGER epoch-second spans from a lead window (one
    shuffle by user); sum(value*dt)/sum(dt) then aggregates
    map-side. Integer weights keep the weighted sum's magnitude
    deterministic; the final division is one float op per group,
    rounded like the `percentiles` family.
    """
    _utc(spark)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    spans = _t(spark, sf_dir, "events").select(
        "user_id",
        "value",
        (
            F.lead(F.unix_timestamp("ts")).over(w) - F.unix_timestamp("ts")
        ).alias("dt_secs"),
    )
    return (
        spans.where(F.col("dt_secs").isNotNull() & (F.col("dt_secs") > 0))
        .groupBy("user_id")
        .agg(
            F.sum("dt_secs").cast("bigint").alias("span_secs"),
            F.round(
                F.sum(F.col("value") * F.col("dt_secs")) / F.sum("dt_secs"), 4
            ).alias("twap"),
        )
    )


@register(
    "trailing_hour_counts",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER (PARTITION BY user_id
                ORDER BY floor(epoch(ts))::BIGINT
                RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n_last_hour
    FROM events
    """,
    tags=("window", "range-frame", "time-interval", "rate-limiting"),
)
def q_trailing_hour_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-hour activity count: for every event, how
    many of the same user's events (itself included) fall in the
    preceding 3600 seconds — the rate-limiting / burst-detection
    primitive.

    This is a RANGE frame over integer epoch seconds (a VALUE-based
    frame — ``moving_average`` covers the ROWS-based kind): frame
    membership follows the ordering value, so same-second events
    share a count on both engines with no tiebreak ambiguity. State
    per partition is one sliding hour of rows; one shuffle by user.
    """
    _utc(spark)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_last_hour"),
    )


@register(
    "interpolate_series",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               / count(*) AS v
      FROM events GROUP BY user_id, CAST(ts AS DATE)),
    bounds AS (
      SELECT user_id, min(day) AS lo, max(day) AS hi
      FROM daily GROUP BY user_id),
    spine AS (
      SELECT user_id,
             CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM bounds),
    joined AS (
      SELECT s.user_id, s.day, d.v FROM spine s
      LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day),
    w AS (
      SELECT user_id, day, v,
        last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
        first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY day
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM joined)
    SELECT user_id, day, v IS NOT NULL AS observed,
           CASE WHEN v IS NOT NULL THEN v
                ELSE pv + (nv - pv)
                     * (CAST(datediff('day', pd, day) AS DOUBLE)
                        / CAST(datediff('day', pd, nd) AS DOUBLE)) END
             AS v_filled
    FROM w
    """,
    tags=("time-series", "interpolation", "date-spine", "gap-fill"),
)
def q_interpolate_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over per-user date spines: daily average
    value, densified to every calendar day between each user's first
    and last active day, with gaps filled by straight-line
    interpolation between the bracketing observations — the numeric
    companion to ``forward_fill_series``'s LOCF (step) fill.

    Scale design: the spine is bounded per user (``sequence(min_day,
    max_day)``), so densification is proportional to real activity
    spans, not |users|x|global days|; the fill is two
    mirror-image IGNORE-NULLS windows over ONE shuffle by user.
    Determinism: daily means aggregate in exact DECIMAL with a single
    IEEE division; the interpolation arithmetic is the identical
    left-associated double expression on both engines over integer
    day offsets, emitted UNROUNDED (bit-identical doubles beat
    cross-engine round()-at-the-half-ulp disagreements). Spine endpoints are
    observed days, so every gap is bracketed and no fill is NULL.
    """
    _utc(spark)
    from pyspark.sql import Window

    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            (
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("v")
        )
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi")).alias("day"),
        )
    )
    joined = spine.join(daily, ["user_id", "day"], "left")
    prev_w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    next_w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    w = joined.select(
        "user_id",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(prev_w).alias("pv"),
        F.first("v", ignorenulls=True).over(next_w).alias("nv"),
        F.last(obs_day, ignorenulls=True).over(prev_w).alias("pd"),
        F.first(obs_day, ignorenulls=True).over(next_w).alias("nd"),
    )
    frac = F.datediff("day", "pd").cast("double") / F.datediff(
        "nd", "pd"
    ).cast("double")
    return w.select(
        "user_id",
        "day",
        F.col("v").isNotNull().alias("observed"),
        F.when(F.col("v").isNotNull(), F.col("v"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
        .alias("v_filled"),
    )


@register(
    "winsorized_mean",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
               ORDER BY o_totalprice, o_orderkey) AS rk,
             count(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders),
    bounds AS (
      SELECT o_orderpriority, o_totalprice, rk, n,
             max(CASE WHEN rk = (n * 5 + 99) // 100
                 THEN o_totalprice END) OVER (PARTITION BY o_orderpriority)
               AS lo,
             max(CASE WHEN rk = (n * 95 + 99) // 100
                 THEN o_totalprice END) OVER (PARTITION BY o_orderpriority)
               AS hi
      FROM ranked)
    SELECT o_orderpriority,
           CAST(n AS BIGINT) AS n_orders,
           CAST(lo AS DOUBLE) AS p05,
           CAST(hi AS DOUBLE) AS p95,
           round(CAST(sum(least(greatest(o_totalprice, lo), hi)) AS DOUBLE)
                 / n, 4) AS winsorized_mean,
           round(CAST(sum(o_totalprice) AS DOUBLE) / n, 4) AS raw_mean
    FROM bounds
    GROUP BY o_orderpriority, n, lo, hi
    """,
    tags=("robust-stats", "winsorize", "exact-percentile", "window"),
)
def q_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean of order totals per priority: clamp values
    below the exact 5th / above the exact 95th percentile to those
    bounds, then average — the robust mean that tolerates fat tails
    without discarding rows (companion to ``mad_outliers``, which
    flags rather than clamps).

    Percentiles are ORDER STATISTICS, not interpolations: rank
    ``ceil(q·n)`` under a deterministic (value, orderkey) tiebreak,
    computed with pure integer arithmetic (``(n·5+99) div 100``), so
    bound values are actual DECIMAL data values and both engines pick
    the identical row. Clamping and summing stay in exact DECIMAL;
    the only float ops are two final divisions per group. One shuffle
    by priority; the rank/count/bounds windows all share that single
    sort — no extra exchange (same pattern the plan tests pin for
    ``customer_rank_battery``). Scale note: exact per-group order
    statistics put each group through one window partition — right
    for moderate group sizes; at fact-scale groups swap the bounds
    to ``quantile_sketch_by_status``'s mergeable sketch and keep the
    DECIMAL clamp+mean unchanged."""
    _utc(spark)
    from pyspark.sql import Window

    part = Window.partitionBy("o_orderpriority")
    ranked = _t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number()
        .over(part.orderBy("o_totalprice", "o_orderkey"))
        .alias("rk"),
        F.count(F.lit(1)).over(part).alias("n"),
    )
    lo_rk = F.expr("(n * 5 + 99) div 100")
    hi_rk = F.expr("(n * 95 + 99) div 100")
    bounds = ranked.select(
        "*",
        F.max(F.when(F.col("rk") == lo_rk, F.col("o_totalprice")))
        .over(part)
        .alias("lo"),
        F.max(F.when(F.col("rk") == hi_rk, F.col("o_totalprice")))
        .over(part)
        .alias("hi"),
    )
    return (
        bounds.groupBy("o_orderpriority", "n", "lo", "hi")
        .agg(
            F.round(
                F.sum(
                    F.least(
                        F.greatest(F.col("o_totalprice"), F.col("lo")),
                        F.col("hi"),
                    )
                ).cast("double")
                / F.col("n"),
                4,
            ).alias("winsorized_mean"),
            F.round(
                F.sum("o_totalprice").cast("double") / F.col("n"), 4
            ).alias("raw_mean"),
        )
        .select(
            "o_orderpriority",
            F.col("n").cast("bigint").alias("n_orders"),
            F.col("lo").cast("double").alias("p05"),
            F.col("hi").cast("double").alias("p95"),
            "winsorized_mean",
            "raw_mean",
        )
    )


@register(
    "ab_assignment_lift",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN CAST('0x' || substring(
                    md5('exp1:' || CAST(user_id AS VARCHAR)), 1, 15)
                  AS BIGINT) % 2 = 0
                  THEN 'control' ELSE 'treatment' END AS variant,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS n_purchases,
             sum(CASE WHEN event_type = 'purchase'
                 THEN CAST(value AS DECIMAL(12,2))
                 ELSE CAST(0 AS DECIMAL(12,2)) END) AS purchase_value
      FROM events GROUP BY user_id),
    v AS (
      SELECT
        sum(CASE WHEN variant = 'control' THEN 1 ELSE 0 END) AS cu,
        sum(CASE WHEN variant = 'treatment' THEN 1 ELSE 0 END) AS tu,
        sum(CASE WHEN variant = 'control' THEN n_purchases ELSE 0 END) AS cp,
        sum(CASE WHEN variant = 'treatment' THEN n_purchases ELSE 0 END) AS tp,
        CAST(sum(CASE WHEN variant = 'control' THEN purchase_value
                 ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS cv,
        CAST(sum(CASE WHEN variant = 'treatment' THEN purchase_value
                 ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS tv
      FROM per_user)
    SELECT CAST(cu AS BIGINT) AS control_users,
           CAST(tu AS BIGINT) AS treatment_users,
           CAST(cp AS BIGINT) AS control_purchases,
           CAST(tp AS BIGINT) AS treatment_purchases,
           cv / cu AS control_value_per_user,
           tv / tu AS treatment_value_per_user,
           (tv / tu) / (cv / cu) AS lift
    FROM v
    """,
    tags=("experimentation", "ab-test", "hash-assignment", "lift"),
)
def q_ab_assignment_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-based experiment assignment + lift readout: every user
    deterministically lands in control/treatment by md5 parity (the
    stable, join-free bucketing real experimentation systems use — no
    assignment table, any engine recomputes the same split), then
    per-variant purchase-value-per-user and the treatment/control
    lift ratio.

    One row out; purchase values aggregate in exact DECIMAL, counts
    are integers, and the three ratios are the identical
    left-associated double divisions on both engines — hash-exact
    without any tolerance. At 100 TB assignment is a map-side
    expression on the fact scan (no dimension join), and the whole
    readout is one partial-agg pass."""
    _utc(spark)
    from ..functions.hashing import md5_long

    dec0 = F.lit(0).cast("decimal(12,2)")
    per_user = (
        _t(spark, sf_dir, "events")
        .groupBy(
            "user_id",
            F.when(md5_long(F.col("user_id"), salt="exp1:") % 2 == 0, "control")
            .otherwise("treatment")
            .alias("variant"),
        )
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("n_purchases"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.col("value").cast("decimal(12,2)"),
                ).otherwise(dec0)
            ).alias("purchase_value"),
        )
    )
    is_c = F.col("variant") == "control"
    is_t = F.col("variant") == "treatment"
    v = per_user.agg(
        F.sum(F.when(is_c, 1).otherwise(0)).alias("cu"),
        F.sum(F.when(is_t, 1).otherwise(0)).alias("tu"),
        F.sum(F.when(is_c, F.col("n_purchases")).otherwise(0)).alias("cp"),
        F.sum(F.when(is_t, F.col("n_purchases")).otherwise(0)).alias("tp"),
        F.sum(F.when(is_c, F.col("purchase_value")).otherwise(dec0))
        .cast("double")
        .alias("cv"),
        F.sum(F.when(is_t, F.col("purchase_value")).otherwise(dec0))
        .cast("double")
        .alias("tv"),
    )
    return v.select(
        F.col("cu").cast("bigint").alias("control_users"),
        F.col("tu").cast("bigint").alias("treatment_users"),
        F.col("cp").cast("bigint").alias("control_purchases"),
        F.col("tp").cast("bigint").alias("treatment_purchases"),
        (F.col("cv") / F.col("cu")).alias("control_value_per_user"),
        (F.col("tv") / F.col("tu")).alias("treatment_value_per_user"),
        ((F.col("tv") / F.col("tu")) / (F.col("cv") / F.col("cu"))).alias(
            "lift"
        ),
    )


@register(
    "table_diff",
    oracle="""
    WITH a AS (
      SELECT o_orderkey AS k,
             md5(CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus || '|' ||
                 CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)
                 || '|' || CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
                 || '|' || o_orderpriority) AS fp
      FROM orders),
    b_src AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 97 <> 0
      UNION ALL
      SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
             o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 89 = 0),
    b AS (
      SELECT o_orderkey AS k,
             md5(CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus || '|' ||
                 CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)
                 || '|' || CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
                 || '|' || o_orderpriority) AS fp
      FROM b_src),
    classified AS (
      SELECT CASE WHEN a.k IS NULL THEN 'added'
                  WHEN b.k IS NULL THEN 'removed'
                  WHEN a.fp <> b.fp THEN 'changed'
                  ELSE 'unchanged' END AS diff_status
      FROM a FULL OUTER JOIN b ON a.k = b.k)
    SELECT diff_status, CAST(count(*) AS BIGINT) AS n_rows
    FROM classified GROUP BY diff_status
    """,
    tags=("reconciliation", "data-diff", "full-outer", "migration"),
)
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff between two table versions (the data-diff /
    migration-verification operator): classify every key as added,
    removed, changed, or unchanged between orders and a simulated
    next-day snapshot (deterministic deletes %97, price updates %101,
    inserts %89 re-keyed) — what a warehouse runs to validate a
    backfill, a replication lag, or a vendor migration, complementing
    ``table_checksum`` (which detects THAT copies differ; this says
    WHERE).

    Scale shape: one 32-hex fingerprint per row (floats as integer
    cents, dates as ISO strings — the ``table_checksum``
    representation contract) and ONE full-outer shuffle on the key —
    the MERGE cost model — instead of column-by-column comparisons.
    Output is |statuses| rows however wide or tall the tables."""
    _utc(spark)
    orders = _t(spark, sf_dir, "orders")

    def fingerprint(df: DataFrame) -> DataFrame:
        fp = F.md5(
            F.concat_ws(
                "|",
                F.col("o_custkey").cast("string"),
                "o_orderstatus",
                F.round(F.col("o_totalprice") * 100)
                .cast("bigint")
                .cast("string"),
                F.col("o_orderdate").cast("date").cast("string"),
                "o_orderpriority",
            )
        )
        return df.select(F.col("o_orderkey").alias("k"), fp.alias("fp"))

    a = fingerprint(orders)
    b = fingerprint(
        orders.filter(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 101 == 0, F.col("o_totalprice") + 1.0
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            orders.filter(F.col("o_orderkey") % 89 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + 100000000
            )
        )
    )
    joined = a.alias("a").join(
        b.alias("b"), F.col("a.k") == F.col("b.k"), "full_outer"
    )
    status = (
        F.when(F.col("a.k").isNull(), "added")
        .when(F.col("b.k").isNull(), "removed")
        .when(F.col("a.fp") != F.col("b.fp"), "changed")
        .otherwise("unchanged")
    )
    return (
        joined.select(status.alias("diff_status"))
        .groupBy("diff_status")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    )


@register(
    "dau_wau_mau",
    oracle="""
    WITH bits AS (
      SELECT CAST(ts AS DATE) AS day,
             user_id // 63 AS chunk,
             bit_or(1::BIGINT << CAST(user_id % 63 AS INT)) AS b
      FROM events GROUP BY 1, 2),
    days AS (SELECT DISTINCT day FROM bits),
    chunks AS (SELECT DISTINCT chunk FROM bits),
    spine AS (
      SELECT d.day, c.chunk, coalesce(b.b, 0) AS b
      FROM days d CROSS JOIN chunks c
      LEFT JOIN bits b ON b.day = d.day AND b.chunk = c.chunk),
    rolled AS (
      SELECT day, chunk, b,
        bit_or(b) OVER (PARTITION BY chunk ORDER BY epoch_days
          RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS wb,
        bit_or(b) OVER (PARTITION BY chunk ORDER BY epoch_days
          RANGE BETWEEN 27 PRECEDING AND CURRENT ROW) AS mb
      FROM (SELECT *, datediff('day', DATE '1970-01-01', day) AS epoch_days
            FROM spine))
    SELECT day,
           CAST(sum(bit_count(b)) AS BIGINT) AS dau,
           CAST(sum(bit_count(wb)) AS BIGINT) AS wau,
           CAST(sum(bit_count(mb)) AS BIGINT) AS mau
    FROM rolled GROUP BY day
    """,
    tags=("engagement", "bitmap", "sliding-distinct", "dau-wau-mau"),
)
def q_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU / MAU engagement curves with EXACT trailing distinct
    counts via sliding bitmap OR — the metric every product team
    computes, and the classic case where naive COUNT(DISTINCT) over a
    28-day self-join re-shuffles every (day, user) pair 28 times.

    Here each day compresses to |users|/63 bitmap longs
    (``bitmap_distinct_users``'s chunk scheme); the trailing windows
    OR those longs per chunk (a RANGE value frame over integer epoch
    days, so calendar gaps are handled), and popcounts sum per day.
    Sliding-window state is chunks·longs, not user sets; everything
    is exact integers, bit-identical to the oracle. The dense
    day×chunk spine keeps a chunk's bits visible to the frame on days
    the chunk itself was idle."""
    _utc(spark)
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    bits = (
        ev.select(
            F.to_date("ts").alias("day"),
            F.expr("user_id div 63").alias("chunk"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))"
            ).alias("bit"),
        )
        .groupBy("day", "chunk")
        .agg(F.bit_or("bit").alias("b"))
    )
    days = bits.select("day").distinct()
    chunks = bits.select("chunk").distinct()
    spine = (
        days.crossJoin(chunks)
        .join(bits, ["day", "chunk"], "left")
        .select(
            "day",
            "chunk",
            F.coalesce("b", F.lit(0)).alias("b"),
            F.datediff("day", F.lit("1970-01-01")).alias("epoch_days"),
        )
    )
    w7 = (
        Window.partitionBy("chunk")
        .orderBy("epoch_days")
        .rangeBetween(-6, Window.currentRow)
    )
    w28 = (
        Window.partitionBy("chunk")
        .orderBy("epoch_days")
        .rangeBetween(-27, Window.currentRow)
    )
    rolled = spine.select(
        "day",
        "b",
        F.bit_or("b").over(w7).alias("wb"),
        F.bit_or("b").over(w28).alias("mb"),
    )
    return rolled.groupBy("day").agg(
        F.sum(F.bit_count("b")).cast("bigint").alias("dau"),
        F.sum(F.bit_count("wb")).cast("bigint").alias("wau"),
        F.sum(F.bit_count("mb")).cast("bigint").alias("mau"),
    )


@register(
    "purchase_attribution",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, value, ts, event_id,
        first_value(event_type) OVER (PARTITION BY user_id
          ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_touch,
        last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
          IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
      FROM events)
    SELECT first_touch,
           coalesce(last_touch, 'none') AS last_touch,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM seq
    WHERE event_type = 'purchase'
    GROUP BY first_touch, coalesce(last_touch, 'none')
    """,
    tags=("attribution", "marketing", "window", "first-last-touch"),
)
def q_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution: every purchase credited to the user's
    FIRST-ever touch (acquisition channel) and the LAST non-purchase
    touch before it (conversion trigger), rolled up to a (first,
    last) matrix of purchase counts and value.

    One shuffle by user; both touches come from the same sort (an
    unbounded first_value and an IGNORE-NULLS last_value over the
    1-preceding frame — LOCF restricted to non-purchase rows).
    Purchases with no prior touch attribute to 'none' on both
    engines; values aggregate in exact DECIMAL. Deterministic under
    the (ts, event_id) tiebreak."""
    _utc(spark)
    from pyspark.sql import Window

    base = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
    )
    seq = _t(spark, sf_dir, "events").select(
        "event_type",
        "value",
        F.first("event_type")
        .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("first_touch"),
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        )
        .over(base.rowsBetween(Window.unboundedPreceding, -1))
        .alias("last_touch"),
    )
    return (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy(
            "first_touch",
            F.coalesce("last_touch", F.lit("none")).alias("last_touch"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


@register(
    "key_skew_report",
    oracle="""
    WITH kc AS (
      SELECT l_orderkey AS k, count(*) AS cnt
      FROM lineitem GROUP BY l_orderkey),
    hist AS (
      SELECT cnt, count(*) AS n_with FROM kc GROUP BY cnt),
    cum AS (
      SELECT cnt, n_with,
             sum(n_with) OVER (ORDER BY cnt) AS cum_keys,
             sum(n_with) OVER () AS n_keys,
             sum(cnt * n_with) OVER () AS n_rows,
             max(cnt) OVER () AS max_cnt
      FROM hist)
    SELECT CAST(max(n_rows) AS BIGINT) AS n_rows,
           CAST(max(n_keys) AS BIGINT) AS n_keys,
           CAST(max(max_cnt) AS BIGINT) AS max_key_rows,
           CAST(10000 * max(max_cnt) // max(n_rows) AS BIGINT)
             AS top_key_share_bp,
           CAST(10000 * max(max_cnt) * max(n_keys) // max(n_rows) AS BIGINT)
             AS skew_vs_avg_bp,
           CAST(min(CASE WHEN cum_keys >= (n_keys * 50 + 99) // 100
                THEN cnt END) AS BIGINT) AS p50_key_rows,
           CAST(min(CASE WHEN cum_keys >= (n_keys * 99 + 99) // 100
                THEN cnt END) AS BIGINT) AS p99_key_rows
    FROM cum
    """,
    tags=("diagnostics", "skew", "join-planning", "profiling"),
)
def q_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics for lineitem.l_orderkey — the
    pre-flight report that decides whether a join needs salting
    (``salted_star_join``), AQE skew splitting, or nothing: total and
    distinct-key counts, the hottest key's row count and its share,
    skew-vs-average ratio, and exact p50/p99 per-key cardinalities.

    Scale shape: per-key counts reduce to a COUNT HISTOGRAM
    (distinct multiplicities — dozens of rows however many keys), and
    the exact percentiles come from a cumulative sum over that frame
    via the two-stage range-partitioned ``running_total``: value at
    rank r = min cnt with cumulative keys ≥ r. No |keys|-sized (or
    even histogram-sized) global window anywhere (the naive
    rank-selection form funnels every key through one window
    partition — the exact bottleneck this report exists to catch).
    All integer arithmetic, shares in basis points."""
    _utc(spark)
    from ..operators.ids import running_total

    kc = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    hist = kc.groupBy("cnt").agg(F.count(F.lit(1)).alias("n_with"))
    totals = hist.agg(
        F.sum("n_with").alias("n_keys"),
        F.sum(F.col("cnt") * F.col("n_with")).alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
    )
    cum = running_total(
        hist, "cnt", "n_with", out_col="cum_keys"
    ).crossJoin(F.broadcast(totals))
    p50_rk = F.expr("(n_keys * 50 + 99) div 100")
    p99_rk = F.expr("(n_keys * 99 + 99) div 100")
    return cum.agg(
        F.max("n_rows").cast("bigint").alias("n_rows"),
        F.max("n_keys").cast("bigint").alias("n_keys"),
        F.max("max_cnt").cast("bigint").alias("max_key_rows"),
        F.expr(
            "CAST(10000 * max(max_cnt) div max(n_rows) AS BIGINT)"
        ).alias("top_key_share_bp"),
        F.expr(
            "CAST(10000 * max(max_cnt) * max(n_keys) div max(n_rows)"
            " AS BIGINT)"
        ).alias("skew_vs_avg_bp"),
        F.min(F.when(F.col("cum_keys") >= p50_rk, F.col("cnt")))
        .cast("bigint")
        .alias("p50_key_rows"),
        F.min(F.when(F.col("cum_keys") >= p99_rk, F.col("cnt")))
        .cast("bigint")
        .alias("p99_key_rows"),
    )


@register(
    "market_basket",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items),
    pc AS (SELECT l_partkey, count(*) AS part_orders
           FROM items GROUP BY l_partkey),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS pair_orders
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING count(*) >= 2)
    SELECT part_a, part_b,
           CAST(pair_orders AS BIGINT) AS pair_orders,
           CAST(10000 * pair_orders // pa.part_orders AS BIGINT)
             AS confidence_ab_bp,
           CAST(10000 * pair_orders * n.n_orders
                // (pa.part_orders * pb.part_orders) AS BIGINT) AS lift_bp
    FROM pairs
    JOIN pc pa ON pa.l_partkey = part_a
    JOIN pc pb ON pb.l_partkey = part_b
    CROSS JOIN n
    """,
    tags=("market-basket", "association-rules", "co-occurrence"),
)
def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order lines: support
    (orders containing both parts), confidence(A→B), and lift, for
    every part pair co-purchased at least twice — the classic
    co-occurrence mining the reference's sale marts stop short of.

    Scale shape: the pair generation is a SELF-JOIN ON THE ORDER KEY,
    so work is Σ(order_size²)/2 — bounded by basket size (≤7 here),
    never |parts|². Pair counts shuffle on the compact (part, part)
    key; per-part totals and the scalar order count join back
    (broadcast-sized). Confidence and lift are integer basis points
    (floor division), so every row is bit-exact cross-engine."""
    _utc(spark)
    # localCheckpoint: `items` feeds four consumers (scalar order
    # count, per-part totals, both sides of the pair self-join);
    # without it each consumer re-runs the scan + distinct
    items = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint()
    )
    n = items.agg(F.count_distinct("l_orderkey").alias("n_orders"))
    pc = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("part_orders")
    )
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("pair_orders"))
        .filter(F.col("pair_orders") >= 2)
    )
    pa = pc.select(
        F.col("l_partkey").alias("part_a"),
        F.col("part_orders").alias("na"),
    )
    pb = pc.select(
        F.col("l_partkey").alias("part_b"),
        F.col("part_orders").alias("nb"),
    )
    return (
        pairs.join(pa, "part_a")
        .join(pb, "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            F.col("pair_orders").cast("bigint").alias("pair_orders"),
            F.expr("CAST(10000 * pair_orders div na AS BIGINT)").alias(
                "confidence_ab_bp"
            ),
            F.expr(
                "CAST(10000 * pair_orders * n_orders div (na * nb)"
                " AS BIGINT)"
            ).alias("lift_bp"),
        )
    )


@register(
    "conversion_latency",
    oracle="""
    WITH s AS (
      SELECT user_id, min(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id),
    p AS (
      SELECT e.user_id,
             floor(epoch(min(e.ts)))::BIGINT
               - floor(epoch(s.signup_ts))::BIGINT AS lat_secs
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
      GROUP BY e.user_id, s.signup_ts),
    hist AS (SELECT lat_secs, count(*) AS n_with FROM p GROUP BY lat_secs),
    cum AS (
      SELECT lat_secs,
             sum(n_with) OVER (ORDER BY lat_secs) AS cum_u,
             sum(n_with) OVER () AS n
      FROM hist),
    tot AS (SELECT count(*) AS n_signup FROM s)
    SELECT CAST(max(tot.n_signup) AS BIGINT) AS n_signup_users,
           CAST(max(n) AS BIGINT) AS n_converted,
           CAST(10000 * max(n) // max(tot.n_signup) AS BIGINT)
             AS conversion_bp,
           CAST(min(CASE WHEN cum_u >= (n * 25 + 99) // 100
                THEN lat_secs END) AS BIGINT) AS p25_secs,
           CAST(min(CASE WHEN cum_u >= (n * 50 + 99) // 100
                THEN lat_secs END) AS BIGINT) AS p50_secs,
           CAST(min(CASE WHEN cum_u >= (n * 75 + 99) // 100
                THEN lat_secs END) AS BIGINT) AS p75_secs,
           CAST(min(CASE WHEN cum_u >= (n * 90 + 99) // 100
                THEN lat_secs END) AS BIGINT) AS p90_secs
    FROM cum CROSS JOIN tot
    """,
    tags=("funnel", "latency", "conversion", "exact-percentile"),
)
def q_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→first-purchase conversion latency distribution: per
    converting user the integer seconds from first signup to first
    subsequent purchase, summarized as conversion rate plus exact
    p25/p50/p75/p90 order statistics — the time-to-value readout
    that complements ``event_funnel``'s step counts.

    Latencies are integer epoch-second diffs (cross-engine exact);
    percentiles come from a LATENCY HISTOGRAM + cumulative-rank
    selection (value at rank r = min latency with cumulative users
    ≥ r) over the two-stage range-partitioned ``running_total`` — no
    |users|-sized (or even |distinct latencies|-sized) frame ever
    passes through a single global window partition."""
    _utc(spark)
    from ..operators.ids import running_total

    ev = _t(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id", "signup_ts")
        .agg(
            (
                F.unix_timestamp(F.min("ts"))
                - F.unix_timestamp("signup_ts")
            ).alias("lat_secs")
        )
    )
    hist = p.groupBy("lat_secs").agg(F.count(F.lit(1)).alias("n_with"))
    total = hist.agg(F.sum("n_with").alias("n"))
    cum = running_total(
        hist, "lat_secs", "n_with", out_col="cum_u"
    ).crossJoin(F.broadcast(total))
    n_signup = s.agg(F.count(F.lit(1)).alias("n_signup"))

    def pct(q: int, name: str):
        return (
            F.min(
                F.when(
                    F.col("cum_u") >= F.expr(f"(n * {q} + 99) div 100"),
                    F.col("lat_secs"),
                )
            )
            .cast("bigint")
            .alias(name)
        )

    return cum.crossJoin(F.broadcast(n_signup)).agg(
        F.max("n_signup").cast("bigint").alias("n_signup_users"),
        F.max("n").cast("bigint").alias("n_converted"),
        F.expr("CAST(10000 * max(n) div max(n_signup) AS BIGINT)").alias(
            "conversion_bp"
        ),
        pct(25, "p25_secs"),
        pct(50, "p50_secs"),
        pct(75, "p75_secs"),
        pct(90, "p90_secs"),
    )


@register(
    "fd_discovery",
    oracle="""
    WITH checks(lhs, rhs) AS (VALUES
      ('o_orderkey', 'o_custkey'),
      ('o_custkey', 'o_orderpriority'),
      ('o_orderpriority', 'o_orderstatus'),
      ('o_orderdate', 'o_orderstatus')),
    cols AS (
      SELECT o_orderkey, o_custkey, o_orderpriority, o_orderstatus,
             o_orderdate FROM orders),
    pairs AS (
      SELECT c.lhs, c.rhs,
             CASE c.lhs WHEN 'o_orderkey' THEN CAST(o_orderkey AS VARCHAR)
                        WHEN 'o_custkey' THEN CAST(o_custkey AS VARCHAR)
                        WHEN 'o_orderpriority' THEN o_orderpriority
                        ELSE CAST(o_orderdate AS VARCHAR) END AS lv,
             CASE c.rhs WHEN 'o_custkey' THEN CAST(o_custkey AS VARCHAR)
                        WHEN 'o_orderpriority' THEN o_orderpriority
                        ELSE o_orderstatus END AS rv
      FROM cols CROSS JOIN checks c),
    per_lhs AS (
      SELECT lhs, rhs, lv, count(DISTINCT rv) AS n_rhs
      FROM pairs GROUP BY lhs, rhs, lv)
    SELECT lhs, rhs,
           CAST(count(*) AS BIGINT) AS n_lhs_values,
           CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating_lhs,
           sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) = 0 AS fd_holds
    FROM per_lhs
    GROUP BY lhs, rhs
    """,
    tags=("profiling", "functional-dependency", "data-quality"),
)
def q_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery over candidate column pairs
    of orders (does A determine B?): per pair, the count of LHS
    values mapping to more than one RHS value — the schema-profiling
    primitive behind key detection, normalization advice, and
    dirty-denormalization checks (o_orderkey→o_custkey holds; the
    reverse-direction candidates fail with measured violation
    counts, not just a boolean).

    All four pair checks run in ONE scan: the pair battery unpivots
    via a per-row explode of 4 (lhs, rhs, lv, rv) structs — one pass
    over orders instead of the 4 scans a projection-union costs (the
    union'd plan re-reads the table per check; at 100 TB that is 4x
    the I/O for the same rows) — then a (pair, lhs-value)
    distinct-count aggregate. Shuffle keys are the stringified
    values; output is |pairs| rows."""
    _utc(spark)
    checks = [
        ("o_orderkey", "o_custkey"),
        ("o_custkey", "o_orderpriority"),
        ("o_orderpriority", "o_orderstatus"),
        ("o_orderdate", "o_orderstatus"),
    ]
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("o_orderkey"),
        F.col("o_custkey").cast("string").alias("o_custkey"),
        "o_orderpriority",
        "o_orderstatus",
        F.col("o_orderdate").cast("string").alias("o_orderdate"),
    )
    pairs = o.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(lhs).alias("lhs"),
                        F.lit(rhs).alias("rhs"),
                        F.col(lhs).alias("lv"),
                        F.col(rhs).alias("rv"),
                    )
                    for lhs, rhs in checks
                ]
            )
        ).alias("p")
    ).select("p.lhs", "p.rhs", "p.lv", "p.rv")
    per_lhs = pairs.groupBy("lhs", "rhs", "lv").agg(
        F.count_distinct("rv").alias("n_rhs")
    )
    viol = F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0))
    return per_lhs.groupBy("lhs", "rhs").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lhs_values"),
        viol.cast("bigint").alias("n_violating_lhs"),
        (viol == 0).alias("fd_holds"),
    )


@register(
    "completeness_profile",
    oracle="""
    WITH t AS (SELECT count(*) AS n FROM customer)
    SELECT col, CAST(n AS BIGINT) AS n_rows,
           CAST(n_null AS BIGINT) AS n_null,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           CAST(10000 * (n - n_null) // n AS BIGINT) AS filled_bp
    FROM (
      SELECT 'c_name' AS col, count(*) - count(c_name) AS n_null,
             count(DISTINCT c_name) AS n_distinct FROM customer
      UNION ALL
      SELECT 'c_custkey', count(*) - count(c_custkey),
             count(DISTINCT c_custkey) FROM customer
      UNION ALL
      SELECT 'c_nationkey', count(*) - count(c_nationkey),
             count(DISTINCT c_nationkey) FROM customer
      UNION ALL
      SELECT 'c_acctbal', count(*) - count(c_acctbal),
             count(DISTINCT c_acctbal) FROM customer
      UNION ALL
      SELECT 'c_mktsegment', count(*) - count(c_mktsegment),
             count(DISTINCT c_mktsegment) FROM customer
    ) CROSS JOIN t
    """,
    tags=("profiling", "completeness", "datasheet", "data-quality"),
)
def q_completeness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column completeness/cardinality profile of customer — the
    per-column null-rate and distinct-count report every ingest
    pipeline publishes next to its datasheet (``corpus_datasheet``
    covers documents; this is the relational twin).

    One scan computes all five columns' stats as a single aggregate
    row (count/count-distinct pairs), then melts to one row per
    column driver-side — no per-column jobs, no shuffle beyond the
    count-distinct. Fill rates are integer basis points."""
    _utc(spark)
    cols = ["c_name", "c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"]
    c = _t(spark, sf_dir, "customer")
    aggs = [F.count(F.lit(1)).alias("n")]
    for col in cols:
        aggs.append((F.count(F.lit(1)) - F.count(col)).alias(f"null_{col}"))
        aggs.append(F.count_distinct(col).alias(f"dist_{col}"))
    one = c.agg(*aggs)
    melted = None
    for col in cols:
        row = one.select(
            F.lit(col).alias("col"),
            F.col("n").cast("bigint").alias("n_rows"),
            F.col(f"null_{col}").cast("bigint").alias("n_null"),
            F.col(f"dist_{col}").cast("bigint").alias("n_distinct"),
            F.expr(f"CAST(10000 * (n - null_{col}) div n AS BIGINT)").alias(
                "filled_bp"
            ),
        )
        melted = row if melted is None else melted.unionByName(row)
    return melted


@register(
    "weekday_seasonality",
    oracle="""
    WITH base AS (
      SELECT event_type, isodow(CAST(ts AS DATE)) AS dow,
             CAST(value AS DECIMAL(18,6)) AS v
      FROM events),
    per AS (
      SELECT event_type, dow, count(*) AS n,
             CAST(sum(v) AS DOUBLE) / count(*) AS avg_value
      FROM base GROUP BY event_type, dow),
    tot AS (
      SELECT event_type, sum(n) AS n_type FROM per GROUP BY event_type)
    SELECT per.event_type, CAST(dow AS INTEGER) AS dow,
           CAST(n AS BIGINT) AS n_events,
           avg_value,
           CAST(10000 * n // n_type AS BIGINT) AS share_bp
    FROM per JOIN tot ON per.event_type = tot.event_type
    """,
    tags=("seasonality", "weekday-profile", "time-series"),
)
def q_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonality profile per event type: ISO day-of-week
    event counts, mean values, and each weekday's share of the type's
    volume in basis points — the baseline against which day-level
    anomalies are judged (seasonal-naive expectation).

    ISO weekday on both engines (Spark ``weekday()+1`` == DuckDB
    ``isodow``) avoids the 1=Sunday vs 0=Sunday trap; means divide
    exact DECIMAL sums once; shares are integer floor-division bp.
    Two small aggregates over one scan, shuffles keyed on (type,
    dow) — 35 groups however large the fact."""
    _utc(spark)
    per = (
        _t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            (F.weekday(F.to_date("ts")) + 1).alias("dow"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_value"),
        )
    )
    tot = per.groupBy("event_type").agg(F.sum("n").alias("n_type"))
    return per.join(tot, "event_type").select(
        "event_type",
        F.col("dow").cast("int").alias("dow"),
        F.col("n").cast("bigint").alias("n_events"),
        "avg_value",
        F.expr("CAST(10000 * n div n_type AS BIGINT)").alias("share_bp"),
    )


@register(
    "seasonal_anomalies",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             isodow(CAST(ts AS DATE)) AS dow, count(*) AS n
      FROM events GROUP BY 1, 2, 3),
    base AS (
      SELECT event_type, dow,
             sum(n) AS tot_n, count(*) AS n_days
      FROM daily GROUP BY event_type, dow)
    SELECT d.event_type, d.day, CAST(d.n AS BIGINT) AS n_events,
           CAST(b.tot_n // b.n_days AS BIGINT) AS expected_n,
           CAST(10000 * d.n * b.n_days // b.tot_n AS BIGINT)
             AS vs_baseline_bp,
           10000 * d.n * b.n_days // b.tot_n NOT BETWEEN 8500 AND 11500
             AS is_anomaly
    FROM daily d JOIN base b
      ON d.event_type = b.event_type AND d.dow = b.dow
    """,
    tags=("anomaly-detection", "seasonal-baseline", "monitoring"),
)
def q_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive volume anomaly detection: each (event type,
    day) compared against that type's SAME-WEEKDAY average (the
    ``weekday_seasonality`` baseline), flagged when outside
    0.85x-1.15x (a band chosen to flag the tails of this corpus's
    daily variation; the threshold is the alarm's sensitivity knob) —
    the monitoring alarm that doesn't false-positive on ordinary
    weekend dips because weekends are their own baseline.

    Ratios are integer basis points (10000·n·days/total, floor), so
    flags are bit-exact; the baseline join keys on (type, dow) — 35
    rows, broadcast — and the daily aggregate is one partial-agg
    scan."""
    _utc(spark)
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.to_date("ts").alias("day"),
            (F.weekday(F.to_date("ts")) + 1).alias("dow"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    base = daily.groupBy("event_type", "dow").agg(
        F.sum("n").alias("tot_n"), F.count(F.lit(1)).alias("n_days")
    )
    joined = daily.join(F.broadcast(base), ["event_type", "dow"])
    ratio = F.expr("10000 * n * n_days div tot_n")
    return joined.select(
        "event_type",
        "day",
        F.col("n").cast("bigint").alias("n_events"),
        F.expr("CAST(tot_n div n_days AS BIGINT)").alias("expected_n"),
        ratio.cast("bigint").alias("vs_baseline_bp"),
        (~ratio.between(8500, 11500)).alias("is_anomaly"),
    )


@register(
    "distribution_drift",
    oracle="""
    WITH labeled AS (
      SELECT CASE WHEN o_orderdate < DATE '2001-01-01'
                  THEN 'a' ELSE 'b' END AS period,
             least(CAST(o_totalprice AS BIGINT) // 50000, 9) AS bucket
      FROM orders),
    counts AS (
      SELECT bucket,
             sum(CASE WHEN period = 'a' THEN 1 ELSE 0 END) AS na,
             sum(CASE WHEN period = 'b' THEN 1 ELSE 0 END) AS nb
      FROM labeled GROUP BY bucket),
    tot AS (SELECT sum(na) AS ta, sum(nb) AS tb FROM counts)
    SELECT CAST(bucket AS INTEGER) AS bucket,
           CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           CAST(10000 * na // ta AS BIGINT) AS share_a_bp,
           CAST(10000 * nb // tb AS BIGINT) AS share_b_bp,
           CAST(100 * (10000 * na // ta - 10000 * nb // tb)
                    * (10000 * na // ta - 10000 * nb // tb)
                // (10000 * na // ta + 10000 * nb // tb) AS BIGINT)
             AS share_chi2_x100
    FROM counts CROSS JOIN tot
    WHERE 10000 * na // ta + 10000 * nb // tb > 0
    """,
    tags=("drift", "psi", "monitoring", "distribution-compare"),
)
def q_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between two periods (the PSI/chi-square
    family every ML-ops pipeline runs before trusting fresh data):
    order totals bucketed into fixed 50k bands, per-bucket shares of
    the pre-2001 vs 2001+ periods, and a chi-square-style per-bucket
    drift contribution on the BASIS-POINT shares — ENTIRELY integer
    arithmetic over bounded operands (shares ≤ 10000, so every
    product ≤ 1e10 regardless of table size) so the drift report is
    bit-exact cross-engine, unlike the textbook PSI whose ln()
    differs by ulps across libms.

    One scan, one 10-bucket aggregate, one broadcast of the scalar
    totals; drift contributions are per-bucket rows (sum them for
    the scalar statistic) so no cross-partition float summation
    exists anywhere."""
    _utc(spark)
    labeled = _t(spark, sf_dir, "orders").select(
        F.when(F.to_date("o_orderdate") < "2001-01-01", "a")
        .otherwise("b")
        .alias("period"),
        F.least(
            F.expr("CAST(o_totalprice AS BIGINT) div 50000"), F.lit(9)
        ).alias("bucket"),
    )
    counts = labeled.groupBy("bucket").agg(
        F.sum(F.when(F.col("period") == "a", 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("period") == "b", 1).otherwise(0)).alias("nb"),
    )
    tot = counts.agg(
        F.sum("na").alias("ta"), F.sum("nb").alias("tb")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .filter(
            F.expr("10000 * na div ta + 10000 * nb div tb > 0")
        )
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            F.col("na").cast("bigint").alias("n_a"),
            F.col("nb").cast("bigint").alias("n_b"),
            F.expr("CAST(10000 * na div ta AS BIGINT)").alias("share_a_bp"),
            F.expr("CAST(10000 * nb div tb AS BIGINT)").alias("share_b_bp"),
            F.expr(
                "CAST(100 * (10000 * na div ta - 10000 * nb div tb)"
                " * (10000 * na div ta - 10000 * nb div tb)"
                " div (10000 * na div ta + 10000 * nb div tb) AS BIGINT)"
            ).alias("share_chi2_x100"),
        )
    )


def _rfm_threshold_sql(metric: str) -> str:
    """CTE text: exact q25/q50/q75 of ``metric`` over rfm via the
    count-histogram + cumulative-rank pattern."""
    return f"""
    {metric}_h AS (
      SELECT {metric} AS v, count(*) AS n_with FROM rfm GROUP BY {metric}),
    {metric}_c AS (
      SELECT v, sum(n_with) OVER (ORDER BY v) AS cum,
             sum(n_with) OVER () AS n
      FROM {metric}_h),
    {metric}_q AS (
      SELECT min(CASE WHEN cum >= (n * 25 + 99) // 100 THEN v END) AS q25,
             min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN v END) AS q50,
             min(CASE WHEN cum >= (n * 75 + 99) // 100 THEN v END) AS q75
      FROM {metric}_c)"""


@register(
    "rfm_segmentation",
    oracle=f"""
    WITH maxd AS (
      SELECT max(CAST(ts AS DATE)) AS asof FROM events),
    rfm AS (
      SELECT user_id,
             datediff('day', max(CAST(ts AS DATE)), max(maxd.asof))
               AS recency_days,
             count(*) AS frequency,
             CAST(sum(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT)
               AS monetary_cents
      FROM events CROSS JOIN maxd
      WHERE event_type = 'purchase'
      GROUP BY user_id),
    {_rfm_threshold_sql("recency_days")},
    {_rfm_threshold_sql("frequency")},
    {_rfm_threshold_sql("monetary_cents")}
    SELECT user_id,
           CAST(recency_days AS INTEGER) AS recency_days,
           CAST(frequency AS BIGINT) AS frequency,
           monetary_cents,
           CAST(4 - (CASE WHEN recency_days > r.q25 THEN 1 ELSE 0 END
                   + CASE WHEN recency_days > r.q50 THEN 1 ELSE 0 END
                   + CASE WHEN recency_days > r.q75 THEN 1 ELSE 0 END)
                AS INTEGER) AS r_score,
           CAST(1 + (CASE WHEN frequency > f.q25 THEN 1 ELSE 0 END
                   + CASE WHEN frequency > f.q50 THEN 1 ELSE 0 END
                   + CASE WHEN frequency > f.q75 THEN 1 ELSE 0 END)
                AS INTEGER) AS f_score,
           CAST(1 + (CASE WHEN monetary_cents > m.q25 THEN 1 ELSE 0 END
                   + CASE WHEN monetary_cents > m.q50 THEN 1 ELSE 0 END
                   + CASE WHEN monetary_cents > m.q75 THEN 1 ELSE 0 END)
                AS INTEGER) AS m_score
    FROM rfm
    CROSS JOIN recency_days_q r
    CROSS JOIN frequency_q f
    CROSS JOIN monetary_cents_q m
    """,
    tags=("rfm", "segmentation", "customer-analytics"),
)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per purchasing user the classic
    recency / frequency / monetary triple, each scored 1-4 against
    the population's exact quartiles (recency inverted — recent =
    high) — the segmentation every retention team runs.

    All three metrics are integers (days, counts, cents from DECIMAL
    sums), and quartile thresholds come from the count-histogram +
    cumulative-rank pattern over the two-stage range-partitioned
    ``running_total``, so no |users|-row (or |distinct values|-row)
    global window and every score is bit-exact. Thresholds broadcast
    back as one 3-scalar row per metric; the scoring pass is
    map-side."""
    _utc(spark)
    from ..operators.ids import running_total

    ev = _t(spark, sf_dir, "events")
    maxd = ev.agg(F.max(F.to_date("ts")).alias("asof"))
    rfm = (
        ev.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(maxd))
        .groupBy("user_id")
        .agg(
            F.datediff(F.max("asof"), F.max(F.to_date("ts"))).alias(
                "recency_days"
            ),
            F.count(F.lit(1)).alias("frequency"),
            (F.sum(F.col("value").cast("decimal(12,2)")) * 100)
            .cast("bigint")
            .alias("monetary_cents"),
        )
        # consumed FOUR times (three quartile histograms + the final
        # scoring pass): cache the per-user triple so the events scan
        # and purchase aggregation run once, not four times
        .cache()
    )

    def quartiles(metric: str) -> DataFrame:
        hist = rfm.groupBy(F.col(metric).alias("v")).agg(
            F.count(F.lit(1)).alias("n_with")
        )
        total = hist.agg(F.sum("n_with").alias("n"))
        cum = running_total(
            hist, "v", "n_with", out_col="cum"
        ).crossJoin(F.broadcast(total))

        def q(pct: int, name: str):
            return F.min(
                F.when(
                    F.col("cum") >= F.expr(f"(n * {pct} + 99) div 100"),
                    F.col("v"),
                )
            ).alias(name)

        return cum.agg(
            q(25, f"{metric}_q25"), q(50, f"{metric}_q50"),
            q(75, f"{metric}_q75"),
        )

    out = rfm
    for metric in ("recency_days", "frequency", "monetary_cents"):
        out = out.crossJoin(F.broadcast(quartiles(metric)))

    def score(metric: str) -> F.Column:
        above = sum(
            F.when(F.col(metric) > F.col(f"{metric}_q{p}"), 1).otherwise(0)
            for p in (25, 50, 75)
        )
        return above

    return out.select(
        "user_id",
        F.col("recency_days").cast("int").alias("recency_days"),
        F.col("frequency").cast("bigint").alias("frequency"),
        "monetary_cents",
        (F.lit(4) - score("recency_days")).cast("int").alias("r_score"),
        (F.lit(1) + score("frequency")).cast("int").alias("f_score"),
        (F.lit(1) + score("monetary_cents")).cast("int").alias("m_score"),
    )


@register(
    "cumulative_monthly_revenue",
    oracle="""
    WITH monthly AS (
      SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
             count(*) AS n_orders,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1)
    SELECT CAST(month AS DATE) AS month,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(sum(rev) OVER (ORDER BY month) AS DOUBLE) AS cum_revenue,
           CAST(sum(n_orders) OVER (ORDER BY month) AS BIGINT) AS cum_orders
    FROM monthly
    """,
    tags=("bi", "running-total", "cumulative"),
)
def q_cumulative_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue curve — the most-charted BI shape: monthly
    order counts and revenue plus their running totals since the
    first month.

    The heavy table collapses to |months| rows FIRST (one partial-agg
    scan); the running-total window then runs over that tiny frame —
    never a cumulative window over raw orders (which would drag every
    row through one global sort partition). Revenue accumulates in
    exact DECIMAL through the window and casts to double once per
    row, so the running values are cross-engine exact."""
    _utc(spark)
    from pyspark.sql import Window

    monthly = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.trunc(F.to_date("o_orderdate"), "month").alias("month")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
        )
    )
    cum = Window.orderBy("month").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return monthly.select(
        "month",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.col("rev").cast("double").alias("revenue"),
        F.sum("rev").over(cum).cast("double").alias("cum_revenue"),
        F.sum("n_orders").over(cum).cast("bigint").alias("cum_orders"),
    )


@register(
    "cohort_ltv",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             min(date_trunc('month', CAST(o_orderdate AS DATE)))
               AS cohort_month
      FROM orders GROUP BY o_custkey),
    rev AS (
      SELECT f.cohort_month,
             datediff('month', f.cohort_month,
                      date_trunc('month', CAST(o.o_orderdate AS DATE)))
               AS month_offset,
             sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev,
             count(DISTINCT o.o_custkey) AS n_active
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
      GROUP BY 1, 2),
    sizes AS (
      SELECT cohort_month, count(*) AS cohort_size
      FROM firsts GROUP BY cohort_month)
    SELECT CAST(r.cohort_month AS DATE) AS cohort_month,
           CAST(r.month_offset AS INTEGER) AS month_offset,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           CAST(r.n_active AS BIGINT) AS n_active,
           CAST(r.rev AS DOUBLE) AS revenue,
           CAST(sum(r.rev) OVER (PARTITION BY r.cohort_month
                ORDER BY r.month_offset) AS DOUBLE) AS cum_revenue
    FROM rev r JOIN sizes s ON r.cohort_month = s.cohort_month
    WHERE r.month_offset <= 24
    """,
    tags=("bi", "cohort", "ltv", "retention-revenue"),
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle: customers grouped by first-order month,
    revenue per (cohort, months-since-first) cell with active-buyer
    counts and the cumulative-revenue curve per cohort — the
    revenue-side companion to ``retention_cohorts``' user counts,
    and the table behind every LTV/CAC readout.

    One first-touch aggregate, one fact join keyed on the customer
    (the first-touch frame is |customers| rows — co-partitioned with
    the fact on the same key, so AQE chains the shuffles), then
    cumulative windows over the tiny (cohort × offset) triangle.
    Revenue accumulates in exact DECIMAL; offsets are integer month
    diffs (date_trunc parity pinned on both engines)."""
    _utc(spark)
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.trunc(F.to_date("o_orderdate"), "month").alias("omonth"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    firsts = orders.groupBy("o_custkey").agg(
        F.min("omonth").alias("cohort_month")
    )
    rev = (
        orders.join(firsts, "o_custkey")
        .groupBy(
            "cohort_month",
            F.months_between("omonth", F.col("cohort_month"))
            .cast("int")
            .alias("month_offset"),
        )
        .agg(
            F.sum("price").alias("rev"),
            F.count_distinct("o_custkey").alias("n_active"),
        )
    )
    sizes = firsts.groupBy("cohort_month").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    cum = (
        Window.partitionBy("cohort_month")
        .orderBy("month_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        rev.filter(F.col("month_offset") <= 24)
        .join(sizes, "cohort_month")
        .select(
            "cohort_month",
            "month_offset",
            F.col("cohort_size").cast("bigint").alias("cohort_size"),
            F.col("n_active").cast("bigint").alias("n_active"),
            F.col("rev").cast("double").alias("revenue"),
            F.sum("rev").over(cum).cast("double").alias("cum_revenue"),
        )
    )


@register(
    "uniqueness_audit",
    oracle="""
    SELECT 'orders_pk' AS check_name,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_duplicated,
           CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT)
             AS n_rows_affected
    FROM (SELECT o_orderkey, count(*) AS n FROM orders GROUP BY 1)
    UNION ALL
    SELECT 'customer_pk', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT)
    FROM (SELECT c_custkey, count(*) AS n FROM customer GROUP BY 1)
    UNION ALL
    SELECT 'lineitem_composite_pk', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT)
    FROM (SELECT l_orderkey, l_linenumber, count(*) AS n
          FROM lineitem GROUP BY 1, 2)
    UNION ALL
    SELECT 'events_pk', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT)
    FROM (SELECT event_id, count(*) AS n FROM events GROUP BY 1)
    """,
    tags=("data-quality", "uniqueness", "primary-key", "audit"),
)
def q_uniqueness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit across the star schema — the
    constraint check a parquet lake can't enforce declaratively
    (no PK constraints in open formats), so it must be ASSERTED by
    scan: per key-set, the distinct key count, how many key values
    are duplicated, and how many rows those duplicates cover
    (completes the DQ battery: ``referential_audit`` = FK edges,
    ``dq_expectations`` = row rules, this = key constraints).

    Each check is one partial-agg groupBy on its key; the four run
    as a union of |1|-row summaries, so one job audits every
    constraint. Composite keys audit the same way as scalar ones."""
    _utc(spark)

    def check(name: str, table: str, keys: list[str]) -> DataFrame:
        kc = (
            _t(spark, sf_dir, table)
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n"))
        )
        return kc.agg(
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum(F.when(F.col("n") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_duplicated"),
            F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0))
            .cast("bigint")
            .alias("n_rows_affected"),
        )

    return (
        check("orders_pk", "orders", ["o_orderkey"])
        .unionByName(check("customer_pk", "customer", ["c_custkey"]))
        .unionByName(
            check(
                "lineitem_composite_pk",
                "lineitem",
                ["l_orderkey", "l_linenumber"],
            )
        )
        .unionByName(check("events_pk", "events", ["event_id"]))
    )


@register(
    "session_window_agg",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, value,
             CASE WHEN floor(epoch(ts)) - floor(epoch(lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id))) > 1800
                  OR lag(ts) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events),
    sess AS (
      SELECT user_id, ts, value,
             sum(is_start) OVER (PARTITION BY user_id
               ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_id
      FROM seq)
    SELECT user_id,
           min(ts) AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM sess
    GROUP BY user_id, session_id
    """,
    tags=("session-window", "builtin", "sessionization"),
)
def q_session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's BUILT-IN ``session_window``
    aggregation (30-minute inactivity gap): per (user, session) the
    start time, event count, and DECIMAL value total — the native
    operator behind both batch and streaming session aggregation
    (the engine merges overlapping [ts, ts+gap) intervals
    internally; ``sessionize`` pins the equivalent hand-rolled
    gaps-and-islands form, so the two queries cross-validate the
    builtin against first principles).

    The oracle IS that first-principles form — lag gap-flag +
    running session id — so the builtin's session boundaries are
    value-pinned, not just row-counted. One shuffle by user; the
    session merge is in the aggregation, no extra window pass."""
    _utc(spark)
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id",
            F.session_window("ts", "30 minutes").alias("w"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("total_value"),
            F.min("ts").alias("session_start"),
        )
        .select("user_id", "session_start", "n_events", "total_value")
    )


@register(
    "audience_overlap_matrix",
    oracle="""
    WITH bits AS (
      SELECT event_type, user_id // 63 AS chunk,
             bit_or(1::BIGINT << CAST(user_id % 63 AS INT)) AS b
      FROM events GROUP BY 1, 2),
    sizes AS (
      SELECT event_type, sum(bit_count(b)) AS n_users
      FROM bits GROUP BY event_type),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             sum(bit_count(a.b & b.b)) AS n_both
      FROM bits a JOIN bits b
        ON a.chunk = b.chunk AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT type_a, type_b,
           CAST(sa.n_users AS BIGINT) AS n_a,
           CAST(sb.n_users AS BIGINT) AS n_b,
           CAST(p.n_both AS BIGINT) AS n_both,
           CAST(10000 * p.n_both
                // (sa.n_users + sb.n_users - p.n_both) AS BIGINT)
             AS jaccard_bp
    FROM pairs p
    JOIN sizes sa ON sa.event_type = p.type_a
    JOIN sizes sb ON sb.event_type = p.type_b
    """,
    tags=("bitmap", "set-algebra", "audience-overlap", "jaccard"),
)
def q_audience_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT pairwise audience overlap matrix: for every event-type
    pair, both segment sizes, the intersection size, and Jaccard in
    basis points — computed by ANDing the per-type chunk bitmaps
    (``bitmap_distinct_users``'s 63-bit scheme) and popcounting, so
    ALL pairs resolve from one bitmap build without ever
    re-shuffling raw user ids per pair (the exact counterpart to
    ``hll_set_ops``' sketched overlap — use this when ids are dense
    integers, the sketch when they're arbitrary).

    The pair join keys on the chunk id: |types|²/2 × |chunks| bitmap
    rows of two longs, map-side combinable popcount sums, all
    integers — bit-exact. Segment sizes join back from the same
    bitmap frame (one scan total)."""
    _utc(spark)
    bits = (
        _t(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("user_id div 63").alias("chunk"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))"
            ).alias("bit"),
        )
        .groupBy("event_type", "chunk")
        .agg(F.bit_or("bit").alias("b"))
    )
    sizes = bits.groupBy("event_type").agg(
        F.sum(F.bit_count("b")).alias("n_users")
    )
    a, b = bits.alias("a"), bits.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(
            F.sum(
                F.bit_count(F.col("a.b").bitwiseAND(F.col("b.b")))
            ).alias("n_both")
        )
    )
    sa = sizes.select(
        F.col("event_type").alias("type_a"), F.col("n_users").alias("na")
    )
    sb = sizes.select(
        F.col("event_type").alias("type_b"), F.col("n_users").alias("nb")
    )
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("na").cast("bigint").alias("n_a"),
            F.col("nb").cast("bigint").alias("n_b"),
            F.col("n_both").cast("bigint").alias("n_both"),
            F.expr(
                "CAST(10000 * n_both div (na + nb - n_both) AS BIGINT)"
            ).alias("jaccard_bp"),
        )
    )


@register(
    "daily_value_bands",
    oracle="""
    WITH cents AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    hist AS (
      SELECT day, c, count(*) AS n_with FROM cents GROUP BY day, c),
    cum AS (
      SELECT day, c,
             sum(n_with) OVER (PARTITION BY day ORDER BY c) AS cum,
             sum(n_with) OVER (PARTITION BY day) AS n
      FROM hist)
    SELECT day,
           CAST(max(n) AS BIGINT) AS n_events,
           CAST(min(CASE WHEN cum >= (n * 10 + 99) // 100
                THEN c END) AS BIGINT) AS p10_cents,
           CAST(min(CASE WHEN cum >= (n * 50 + 99) // 100
                THEN c END) AS BIGINT) AS p50_cents,
           CAST(min(CASE WHEN cum >= (n * 90 + 99) // 100
                THEN c END) AS BIGINT) AS p90_cents
    FROM cum GROUP BY day
    """,
    tags=("percentile-bands", "grouped-exact-percentiles", "time-series"),
)
def q_daily_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily p10/p50/p90 value bands (the shaded-band time-series
    chart): EXACT grouped percentiles at scale by running the
    count-histogram + cumulative-rank pattern PER GROUP — values
    quantize to integer cents, so each day's histogram is bounded by
    the value domain (~1k rows), not the event count, and the
    per-day window runs over that bounded frame.

    This is the exact companion to ``quantile_sketch_by_status``
    (approximate, unbounded domains): when the metric has a bounded
    discrete domain — money, ratings, latencies in ms buckets —
    grouped EXACT percentiles cost one (group, value) aggregate plus
    a tiny windowed pass, at any row count. All integer arithmetic;
    round-half-even on value*100 matches CAST BIGINT rounding in
    DuckDB and Spark's round() HALF_UP only at exact .5 cents, which
    the two-decimal generator never produces."""
    _utc(spark)
    from pyspark.sql import Window

    cents = _t(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
    )
    hist = cents.groupBy("day", "c").agg(
        F.count(F.lit(1)).alias("n_with")
    )
    wday = Window.partitionBy("day")
    cum = hist.select(
        "day",
        "c",
        F.sum("n_with")
        .over(wday.orderBy("c").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("n_with").over(wday).alias("n"),
    )

    def band(q: int, name: str):
        return (
            F.min(
                F.when(
                    F.col("cum") >= F.expr(f"(n * {q} + 99) div 100"),
                    F.col("c"),
                )
            )
            .cast("bigint")
            .alias(name)
        )

    return cum.groupBy("day").agg(
        F.max("n").cast("bigint").alias("n_events"),
        band(10, "p10_cents"),
        band(50, "p50_cents"),
        band(90, "p90_cents"),
    )


@register(
    "cusum_change_detection",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      FROM events GROUP BY 1, 2),
    tot AS (
      SELECT event_type, sum(n) AS t, count(*) AS d
      FROM daily GROUP BY 1),
    dev AS (
      SELECT dl.event_type, dl.day, dl.n,
             dl.n * tt.d - tt.t AS dv, tt.t
      FROM daily dl JOIN tot tt USING (event_type)),
    s AS (
      SELECT *, sum(dv) OVER (PARTITION BY event_type ORDER BY day) AS cs
      FROM dev)
    SELECT event_type, day, CAST(n AS BIGINT) AS n_events,
           CAST(cs - min(cs) OVER (PARTITION BY event_type ORDER BY day)
                AS BIGINT) AS cusum_scaled,
           (cs - min(cs) OVER (PARTITION BY event_type ORDER BY day)) * 2
             > t AS drift_alarm
    FROM s
    """,
    tags=("change-point", "cusum", "monitoring", "quality-control"),
)
def q_cusum_change_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection over daily volumes per event
    type: the classic quality-control statistic that accumulates
    deviations from the mean and alarms on sustained upward drift —
    catching slow regime changes that per-day anomaly flags
    (``seasonal_anomalies``) miss because no single day is extreme.

    The textbook CUSUM is a RECURSION (max(0, prev + dev)), which
    looks window-inexpressible — but it has the closed form
    ``S_t − min_{s≤t} S_s`` over the plain running sum, so two
    stacked windows compute it declaratively. Deviations are scaled
    integers (``n·D − T`` per day: exactly mean-zero with NO
    division), so the statistic and the ``2·cusum > T`` alarm are
    bit-exact. The heavy table collapses to |type×day| rows before
    any window."""
    _utc(spark)
    from pyspark.sql import Window

    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = daily.groupBy("event_type").agg(
        F.sum("n").alias("t"), F.count(F.lit(1)).alias("d")
    )
    dev = daily.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "day",
        "n",
        (F.col("n") * F.col("d") - F.col("t")).alias("dv"),
        "t",
    )
    run = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    s = dev.withColumn("cs", F.sum("dv").over(run))
    cusum = F.col("cs") - F.min("cs").over(run)
    return s.select(
        "event_type",
        "day",
        F.col("n").cast("bigint").alias("n_events"),
        cusum.cast("bigint").alias("cusum_scaled"),
        (cusum * 2 > F.col("t")).alias("drift_alarm"),
    )


@register(
    "daily_metric_correlation",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      FROM events GROUP BY 1, 2),
    days AS (SELECT DISTINCT day FROM daily),
    types AS (SELECT DISTINCT event_type FROM daily),
    spine AS (
      SELECT t.event_type, d.day, coalesce(dl.n, 0) AS n
      FROM days d CROSS JOIN types t
      LEFT JOIN daily dl
        ON dl.day = d.day AND dl.event_type = t.event_type),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS d,
             sum(a.n) AS sx, sum(b.n) AS sy,
             sum(a.n * b.n) AS sxy,
             sum(a.n * a.n) AS sxx, sum(b.n * b.n) AS syy
      FROM spine a JOIN spine b
        ON a.day = b.day AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT type_a, type_b, CAST(d AS BIGINT) AS n_days,
           CASE WHEN (d*sxx - sx*sx) * (d*syy - sy*sy) = 0 THEN 0.0
                ELSE CAST(d*sxy - sx*sy AS DOUBLE)
                     / (sqrt(CAST(d*sxx - sx*sx AS DOUBLE))
                        * sqrt(CAST(d*syy - sy*sy AS DOUBLE))) END
             AS pearson_r
    FROM pairs
    """,
    tags=("correlation", "cross-metric", "diagnostics"),
)
def q_daily_metric_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation between event types' daily-volume
    series — the cross-metric diagnostic behind "do errors move with
    traffic?" dashboards — computed BIT-EXACTLY: all five correlation
    moments (Σx, Σy, Σxy, Σx², Σy²) accumulate as exact BIGINTs over
    the zero-filled day spine, and the final r is two
    correctly-rounded sqrts and one division of exactly-derived
    doubles, identical in any engine (the engine-native ``corr()``
    accumulates floats in partition order and is NOT reproducible).

    The heavy table collapses to |types|×|days| rows first; the pair
    join is |types|²/2 × |days| tiny rows keyed on the day. Zero
    variance (a constant series) yields r = 0.0 by convention on
    both engines. Moment magnitudes bound the integer range: exact
    up to ~1e8 events/day/type (D·max² < 2^63)."""
    _utc(spark)
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    days = daily.select("day").distinct()
    types = daily.select("event_type").distinct()
    spine = (
        days.crossJoin(types)
        .join(daily, ["day", "event_type"], "left")
        .select(
            "day", "event_type", F.coalesce("n", F.lit(0)).alias("n")
        )
    )
    a, b = spine.alias("a"), spine.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.day") == F.col("b.day"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("d"),
            F.sum("a.n").alias("sx"),
            F.sum("b.n").alias("sy"),
            F.sum(F.col("a.n") * F.col("b.n")).alias("sxy"),
            F.sum(F.col("a.n") * F.col("a.n")).alias("sxx"),
            F.sum(F.col("b.n") * F.col("b.n")).alias("syy"),
        )
    )
    vx = F.col("d") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("d") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("d") * F.col("sxy") - F.col("sx") * F.col("sy")
    return pairs.select(
        "type_a",
        "type_b",
        F.col("d").cast("bigint").alias("n_days"),
        F.when(vx * vy == 0, F.lit(0.0))
        .otherwise(
            cov.cast("double")
            / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double")))
        )
        .alias("pearson_r"),
    )


@register(
    "volume_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      FROM events GROUP BY 1, 2),
    idx AS (
      SELECT event_type, n,
             datediff('day',
               min(day) OVER (PARTITION BY event_type), day) AS x
      FROM daily),
    m AS (
      SELECT event_type, count(*) AS d,
             sum(x) AS sx, sum(n) AS sy,
             sum(x * n) AS sxy, sum(x * x) AS sxx
      FROM idx GROUP BY event_type)
    SELECT event_type, CAST(d AS BIGINT) AS n_days,
           CASE WHEN d*sxx - sx*sx = 0 THEN 0.0
                ELSE CAST(d*sxy - sx*sy AS DOUBLE)
                     / CAST(d*sxx - sx*sx AS DOUBLE) END
             AS slope_per_day,
           (CAST(sy AS DOUBLE) - (CASE WHEN d*sxx - sx*sx = 0 THEN 0.0
                ELSE CAST(d*sxy - sx*sy AS DOUBLE)
                     / CAST(d*sxx - sx*sx AS DOUBLE) END)
             * CAST(sx AS DOUBLE)) / CAST(d AS DOUBLE) AS intercept,
           d*sxy - sx*sy > 0 AS growing
    FROM m
    """,
    tags=("regression", "trend", "ols", "forecast-input"),
)
def q_volume_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type volume trend line: ordinary-least-squares slope and
    intercept of daily event counts against the day index — the
    growing/declining readout behind capacity planning, with the
    growth verdict decided on the EXACT integer covariance sign (no
    float compare at the boundary).

    Same exactness discipline as ``daily_metric_correlation``: all
    OLS moments are BIGINTs (day indexes are small ints, counts
    exact), slope is one IEEE division of exactly-derived values,
    intercept one more multiply/subtract/divide in identical order —
    bit-reproducible, unlike ``regr_slope``-style float
    accumulators. The fact collapses to |type×day| rows before any
    arithmetic."""
    _utc(spark)
    from pyspark.sql import Window

    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    idx = daily.select(
        "event_type",
        "n",
        F.datediff(
            "day", F.min("day").over(Window.partitionBy("event_type"))
        ).alias("x"),
    )
    m = idx.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("d"),
        F.sum("x").alias("sx"),
        F.sum("n").alias("sy"),
        F.sum(F.col("x") * F.col("n")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    den = F.col("d") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("d") * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = F.when(den == 0, F.lit(0.0)).otherwise(
        num.cast("double") / den.cast("double")
    )
    return m.select(
        "event_type",
        F.col("d").cast("bigint").alias("n_days"),
        slope.alias("slope_per_day"),
        (
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("d").cast("double")
        ).alias("intercept"),
        (num > 0).alias("growing"),
    )


@register(
    "part_reachability_bfs",
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    bfs AS (
      SELECT p_partkey AS node, 0 AS hops
      FROM part WHERE p_type = 'PROMO' AND p_size = 50
      UNION
      SELECT e.dst, b.hops + 1
      FROM bfs b JOIN edges e ON e.src = b.node
      WHERE b.hops < 3
    )
    SELECT node AS p_partkey, CAST(min(hops) AS INT) AS hops
    FROM bfs GROUP BY node
    """,
    tags=("graph", "bfs", "iterative", "recursive-cte"),
)
def q_part_reachability_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum hop distance from seed parts over the co-purchase
    graph (parts sharing an order are adjacent), bounded at 3 hops —
    the engine's bounded-traversal class, the DataFrame answer to a
    recursive CTE (which the reference's MySQL 8 could run but its
    pipeline never does; sql_commands has no WITH RECURSIVE).

    The oracle IS a recursive CTE; the engine runs frontier BFS
    (:func:`~..operators.graph.bounded_bfs`): per round, only the
    newly-reached frontier joins the edge list, then anti-joins the
    reached set — each round is one shuffle keyed on the partkey, and
    dense graphs can't re-expand paths the way naive UNION ALL
    recursion does. Edge building is the only fact-fact self-join
    (keyed on l_orderkey — bucket-friendly); at 100 TB the edge list
    would persist bucketed by src and every BFS reuses it
    shuffle-free."""
    _utc(spark)
    from ..operators.graph import bounded_bfs

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
    )
    seeds = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_type") == "PROMO") & (F.col("p_size") == 50))
        .select(F.col("p_partkey").alias("node"))
    )
    out = bounded_bfs(edges, seeds, max_hops=3)
    return out.select(
        F.col("node").alias("p_partkey"), F.col("hops").cast("int").alias("hops")
    )


@register(
    "part_triangle_enumeration",
    oracle="""
    WITH e AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING count(DISTINCT a.l_orderkey) >= 2
    )
    SELECT e1.u AS node_a, e1.v AS node_b, e2.v AS node_c
    FROM e e1
    JOIN e e2 ON e2.u = e1.v
    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    """,
    tags=("graph", "triangles", "wedge-join", "degree-orientation"),
)
def q_part_triangle_enumeration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles in the support-≥2 co-purchase graph (parts bought
    together in ≥2 distinct orders) — the cluster-cohesion primitive
    under community detection and recommendation features.

    The oracle enumerates by id order (e1⋈e2⋈e3); the engine runs the
    degree-ORIENTED wedge join (:func:`~..operators.graph.
    triangle_enumeration`): edges point from the (degree, id)-smaller
    endpoint, wedges form only at sources, so max out-degree is
    O(sqrt(m)) and a hub part with 10k partners contributes ~m wedges
    instead of 10k² — the difference between a plan that survives a
    power-law co-purchase graph at 100 TB and one that doesn't. Both
    produce identical sorted triples. The support threshold (exact
    count-distinct per pair, keyed on the pair) prunes the noise
    edges BEFORE any quadratic step."""
    _utc(spark)
    from ..operators.graph import triangle_enumeration

    # checkpoint_edges: the canonical edge list feeds six consumers
    # inside the wedge cascade; without materialization each one
    # re-runs the lineitem self-join + count-distinct subtree
    # (measured r14: see OPTIMIZATION_r14.md)
    return triangle_enumeration(
        _copurchase_edges(spark, sf_dir), checkpoint_edges=True
    )


@register(
    "link_prediction_common_neighbors",
    oracle="""
    WITH e AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING count(DISTINCT a.l_orderkey) >= 2
    ),
    sym AS (SELECT u AS s, v AS n FROM e UNION ALL SELECT v, u FROM e),
    keep AS (SELECT s FROM sym GROUP BY s HAVING count(*) <= 256),
    capped AS (SELECT sym.s, sym.n FROM sym JOIN keep ON keep.s = sym.s),
    wedge AS (
      SELECT a.n AS node_a, b.n AS node_b, count(*) AS common_neighbors
      FROM capped a JOIN capped b ON a.s = b.s AND a.n < b.n
      GROUP BY 1, 2
      HAVING count(*) >= 2
    )
    SELECT node_a, node_b, common_neighbors
    FROM wedge w
    WHERE NOT EXISTS (
      SELECT 1 FROM e WHERE e.u = w.node_a AND e.v = w.node_b
    )
    """,
    tags=("graph", "link-prediction", "wedge-join", "anti-join"),
)
def q_link_prediction_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recommendation candidates on the support-≥2 co-purchase graph:
    part pairs NEVER bought together that share ≥2 co-purchase
    partners — common-neighbor link prediction, the open-wedge
    complement of `part_triangle_enumeration` (same wedge formation,
    ANTI join against the edge set instead of the closing join). The
    score is an integer count, so there is no Adamic-Adar-style float
    sum for the engines to disagree on; the NOT EXISTS lowers to a
    broadcast-able anti join on the (node_a, node_b) pair key.

    Centers with degree > 256 are dropped before wedge formation —
    on BOTH sides, so the oracle stays value-exact — bounding the
    wedge join at O(m·256) rows on any graph (see
    :func:`~..operators.graph.common_neighbor_candidates` for why
    exact open-wedge counting is inherently Σd² at hubs: unlike
    triangles there is no closing edge to re-orient against). At the
    test SFs max degree is 13 so the cap is inert; on a power-law
    co-purchase graph at 100 TB it is the difference between a
    bounded plan and a best-seller-part d² blowup."""
    _utc(spark)
    from ..operators.graph import common_neighbor_candidates

    return common_neighbor_candidates(
        _copurchase_edges(spark, sf_dir),
        min_common=2,
        max_center_degree=256,
        checkpoint_edges=True,
    )


_COPURCHASE_EDGES_SQL = """
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING count(DISTINCT a.l_orderkey) >= 2
"""


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Support-≥2 co-purchase part graph — the shared input of the
    graph family (triangles, BFS, link prediction, k-truss,
    PageRank): distinct part pairs bought together in ≥2 distinct
    orders, u < v."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .agg(F.countDistinct("a.l_orderkey").alias("w"))
        .filter(F.col("w") >= 2)
        .select("u", "v")
    )


def _ktruss_oracle(k: int = 3, rounds: int = 12) -> str:
    """Unrolled peeling oracle: DuckDB can't aggregate in a recursive
    CTE, so each peel round is its own (sym, support, filter) CTE
    chain; extra rounds past convergence are no-ops. The unroll count
    EQUALS the engine's max_rounds (12): any dataset the engine
    completes on (it raises past max_rounds) converges within the
    unroll, so engine and oracle can never silently diverge on a
    peeling depth in between. Final support is recomputed on the
    converged edge set. Every CTE is MATERIALIZED — default inlining
    would expand the round chain into 3^rounds copies of the lineitem
    self-join (observed as an fd-exhaustion blowup)."""
    parts = [f"WITH e0 AS MATERIALIZED ({_COPURCHASE_EDGES_SQL})"]
    for i in range(rounds):
        parts.append(f"""
    , sym{i} AS MATERIALIZED (SELECT u AS s, v AS n FROM e{i}
                 UNION ALL SELECT v, u FROM e{i}),
    sup{i} AS MATERIALIZED (
      SELECT e{i}.u, e{i}.v, count(*) AS s
      FROM e{i} JOIN sym{i} a ON a.s = e{i}.u
                JOIN sym{i} b ON b.s = e{i}.v AND b.n = a.n
      GROUP BY e{i}.u, e{i}.v
    ),
    e{i + 1} AS MATERIALIZED (SELECT u, v FROM sup{i} WHERE s >= {k - 2})""")
    parts.append(f"""
    , symF AS MATERIALIZED (SELECT u AS s, v AS n FROM e{rounds}
               UNION ALL SELECT v, u FROM e{rounds}),
    supF AS MATERIALIZED (
      SELECT e{rounds}.u, e{rounds}.v, count(*) AS s
      FROM e{rounds} JOIN symF a ON a.s = e{rounds}.u
                     JOIN symF b ON b.s = e{rounds}.v AND b.n = a.n
      GROUP BY e{rounds}.u, e{rounds}.v
    )
    SELECT u AS node_a, v AS node_b, CAST(s AS BIGINT) AS support
    FROM supF WHERE s >= {k - 2}""")
    return "".join(parts)


@register(
    "part_k_truss",
    oracle=_ktruss_oracle(k=3, rounds=12),
    tags=("graph", "k-truss", "community", "iterative"),
)
def q_part_k_truss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-truss of the co-purchase graph: the maximal subgraph where
    every surviving edge still closes ≥1 triangle AFTER weaker edges
    are peeled away — the cohesive product-community core one notch
    stronger than connected components (a bridge edge joins two
    components; it never survives a truss). Engine: iterative peeling
    with per-round support from the degree-ORIENTED triangle join
    (`operators/graph.py:k_truss`), hub-safe at 100 TB; rounds =
    peeling depth, convergence enforced (raises rather than return a
    non-maximal subgraph). Oracle: the same peeling unrolled to 12
    fixed rounds — deliberately matching the engine's max_rounds, so
    neither side can silently diverge past convergence."""
    _utc(spark)
    from ..operators.graph import k_truss

    return k_truss(_copurchase_edges(spark, sf_dir), k=3)


def _pagerank_oracle(iterations: int = 5) -> str:
    """Unrolled integer-PageRank oracle: one (message, rank) CTE pair
    per iteration, BIGINT micro-unit arithmetic identical to the
    engine's (`//` floor-division on positives == Spark's DIV)."""
    parts = [
        f"WITH e AS ({_COPURCHASE_EDGES_SQL})",
        """
    , sym AS (SELECT u AS s, v AS d FROM e UNION ALL SELECT v, u FROM e),
    deg AS (SELECT s, count(*) AS deg FROM sym GROUP BY s),
    r0 AS (SELECT s AS node, CAST(1000000 AS BIGINT) AS r FROM deg)""",
    ]
    for i in range(iterations):
        parts.append(f"""
    , m{i} AS (
      SELECT sym.d AS node, sum(r{i}.r // deg.deg) AS m
      FROM sym JOIN deg ON deg.s = sym.s JOIN r{i} ON r{i}.node = sym.s
      GROUP BY sym.d
    ),
    r{i + 1} AS (
      SELECT deg.s AS node,
             CAST(150000 + (85 * coalesce(m{i}.m, 0)) // 100 AS BIGINT) AS r
      FROM deg LEFT JOIN m{i} ON m{i}.node = deg.s
    )""")
    parts.append(f"""
    SELECT node AS p_partkey, r AS rank_micros FROM r{iterations}""")
    return "".join(parts)


@register(
    "part_pagerank",
    oracle=_pagerank_oracle(iterations=5),
    tags=("graph", "pagerank", "iterative", "integer-deterministic"),
)
def q_part_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-iteration PageRank over the co-purchase graph in integer
    micro-units (`operators/graph.py:pagerank_integer`): per-edge
    contributions are `rank DIV degree`, the damped update is
    `150000 + 85·sum DIV 100` — all BIGINT, so sums are associative
    and the ranks are bit-identical across engines, partitionings,
    and execution orders (a float PageRank's sum order would drift;
    same determinism trick as the integer-quantized surprisal).
    Each iteration is one join + one sum-by-destination — the Pregel
    message pattern as DataFrame ops, lineage truncated per round."""
    _utc(spark)
    from ..operators.graph import pagerank_integer

    return pagerank_integer(
        _copurchase_edges(spark, sf_dir), iterations=5
    ).select(F.col("node").alias("p_partkey"), "rank_micros")


def _lpa_oracle(iterations: int = 4) -> str:
    """Unrolled synchronous-LPA oracle: per round one neighbor-label
    count CTE + one argmax CTE (row_number ordered by count DESC,
    label ASC — the deterministic tie-break). MATERIALIZED to stop
    DuckDB inlining the round chain (same fd blowup the k-truss
    oracle hit)."""
    parts = [
        f"WITH e AS MATERIALIZED ({_COPURCHASE_EDGES_SQL})",
        """
    , sym AS MATERIALIZED
        (SELECT u AS s, v AS n FROM e UNION ALL SELECT v, u FROM e),
    lab0 AS MATERIALIZED (SELECT DISTINCT s AS node, s AS label FROM sym)""",
    ]
    for i in range(iterations):
        parts.append(f"""
    , cnt{i} AS MATERIALIZED (
      SELECT sym.s AS node, l.label, count(*) AS c
      FROM sym JOIN lab{i} l ON l.node = sym.n
      GROUP BY sym.s, l.label
    ),
    lab{i + 1} AS MATERIALIZED (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node
                                  ORDER BY c DESC, label ASC) AS rn
        FROM cnt{i})
      WHERE rn = 1
    )""")
    parts.append(f"""
    SELECT node AS p_partkey, label AS community FROM lab{iterations}""")
    return "".join(parts)


def _kcore_oracle(k: int = 3, rounds: int = 30) -> str:
    """Unrolled node-degree peeling (same fixed-unroll +
    MATERIALIZED-CTE contract as the k-truss oracle). The unroll
    EQUALS the engine's max_rounds (30): the engine raises past it,
    so any completed run converges within the unroll and the two
    sides can't silently diverge on deeper peeling chains (e.g. a
    long path peels one link per round)."""
    parts = [f"WITH e0 AS MATERIALIZED ({_COPURCHASE_EDGES_SQL})"]
    for i in range(rounds):
        parts.append(f"""
    , deg{i} AS MATERIALIZED (
      SELECT n, count(*) AS d FROM (
        SELECT u AS n FROM e{i} UNION ALL SELECT v FROM e{i})
      GROUP BY n),
    keep{i} AS MATERIALIZED (SELECT n FROM deg{i} WHERE d >= {k}),
    e{i + 1} AS MATERIALIZED (
      SELECT e{i}.u, e{i}.v FROM e{i}
      JOIN keep{i} ka ON ka.n = e{i}.u
      JOIN keep{i} kb ON kb.n = e{i}.v)""")
    parts.append(f"""
    SELECT u AS node_a, v AS node_b FROM e{rounds}""")
    return "".join(parts)


@register(
    "part_k_core",
    oracle=_kcore_oracle(k=3, rounds=30),
    tags=("graph", "k-core", "peeling", "iterative"),
)
def q_part_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the co-purchase graph: iterative node-degree peeling
    (`operators/graph.py:k_core`) — the standard cheap pre-filter
    before cohesion analysis (a node outside the 2-core is in no
    triangle; outside the k-core, in no (k+1)-clique). Each round is
    a degree aggregate + two semi joins, O(m) regardless of skew —
    no wedge join anywhere, unlike k-truss. Oracle unrolls the
    engine's max_rounds=30 (no-ops past convergence; the engine
    raises if it ever needs more, so no silent divergence)."""
    _utc(spark)
    from ..operators.graph import k_core

    return k_core(_copurchase_edges(spark, sf_dir), k=3)


@register(
    "part_communities_lpa",
    oracle=_lpa_oracle(iterations=4),
    tags=("graph", "communities", "label-propagation", "iterative"),
)
def q_part_communities_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product communities by synchronous label propagation over the
    co-purchase graph (`operators/graph.py:label_propagation`):
    4 fixed rounds of adopt-the-most-frequent-neighbor-label with a
    smallest-label tie-break — fully deterministic (no RNG, no visit
    order), so the DuckDB oracle replays the identical rounds and the
    community assignment hash-matches. Completes the graph family's
    community lens: connected components (reachability), k-truss
    (cohesion), LPA (density clusters without a minimum-triangle
    requirement)."""
    _utc(spark)
    from ..operators.graph import label_propagation

    return label_propagation(
        _copurchase_edges(spark, sf_dir), iterations=4
    ).select(F.col("node").alias("p_partkey"), "community")


@register(
    "brand_revenue_gini",
    oracle="""
    WITH rev AS (
      SELECT p.p_brand, l.l_partkey,
             sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                      AS DECIMAL(18,4))) AS r
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2),
    ranked AS (
      SELECT p_brand, r,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY r, l_partkey) AS rk
      FROM rev)
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(r) AS DOUBLE) AS total_revenue,
           round((2 * CAST(sum(rk * r) AS DOUBLE)
                  - (count(*) + 1) * CAST(sum(r) AS DOUBLE))
                 / (count(*) * CAST(sum(r) AS DOUBLE)), 6) AS gini
    FROM ranked GROUP BY p_brand
    """,
    tags=("profiling", "inequality", "gini", "window"),
)
def q_brand_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration profile per brand: the Gini coefficient
    of part-level revenue — 0 when every part sells equally, →1 when
    one part carries the brand (the assortment-risk metric every
    category manager tracks, and the skew early-warning for
    partitioning by part key). Computed by the rank formula
    G = (2·Σ rank·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) over a per-brand window
    ordered by (revenue, partkey) — a TOTAL order, so ranks and both
    sums are deterministic; sums run in exact DECIMAL and the only
    float work is one subtraction/division per brand, rounded at 6
    places (hash-exact cross-engine). Window partitions are
    brand-sized, never global."""
    _utc(spark)
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).alias("r")
        )
    )
    w = Window.partitionBy("p_brand").orderBy("r", "l_partkey")
    ranked = rev.withColumn("rk", F.row_number().over(w))
    n = F.count("*")
    tot = F.sum("r").cast("double")
    return ranked.groupBy("p_brand").agg(
        n.cast("bigint").alias("n_parts"),
        tot.alias("total_revenue"),
        F.round(
            (
                2 * F.sum(F.col("rk") * F.col("r")).cast("double")
                - (n + 1) * tot
            )
            / (n * tot),
            6,
        ).alias("gini"),
    )


@register(
    "item_similarity_cosine",
    oracle="""
    WITH w AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v,
             count(DISTINCT a.l_orderkey) AS w
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING count(DISTINCT a.l_orderkey) >= 2),
    strength AS (
      SELECT u AS node, sum(w) AS s FROM w GROUP BY u
      UNION ALL
      SELECT v, sum(w) FROM w GROUP BY v),
    st AS (SELECT node, CAST(sum(s) AS BIGINT) AS s
           FROM strength GROUP BY node)
    SELECT w.u AS node_a, w.v AS node_b,
           CAST(w.w AS BIGINT) AS cooccur,
           round(w.w / sqrt(CAST(sa.s * sb.s AS DOUBLE)), 6) AS cosine
    FROM w JOIN st sa ON sa.node = w.u JOIN st sb ON sb.node = w.v
    """,
    tags=("graph", "recommender", "cosine", "co-occurrence"),
)
def q_item_similarity_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item similarity on the weighted co-purchase graph — the
    collaborative-filtering primitive one step past raw co-occurrence
    counts: cosine-normalize each pair's weight by the endpoints'
    total co-purchase strength, so a pair of niche parts that
    always sell together outranks a pair that co-occurs only because
    both are popular (the same popularity correction the
    link-prediction cap applies structurally). The strength table is
    one aggregate over the edge list; the normalization is one
    integer product, one sqrt and one division per pair — identical
    single IEEE ops on both engines, rounded at 6 places — so the
    scores hash-match the oracle. At 100 TB everything is keyed on
    part ids; nothing touches the fact table after the edge build."""
    _utc(spark)
    # localCheckpoint: the weighted edge list feeds three consumers
    # (strength union 2x + the final pair join); without it each one
    # recomputes the lineitem self-join + count-distinct subtree
    edges = (
        _copurchase_edges_weighted(spark, sf_dir)
        .select("u", "v", "w")
        .localCheckpoint()
    )
    strength = (
        edges.select(F.col("u").alias("node"), "w")
        .unionAll(edges.select(F.col("v").alias("node"), "w"))
        .groupBy("node")
        .agg(F.sum("w").cast("bigint").alias("s"))
    )
    sa = strength.select(F.col("node").alias("u"), F.col("s").alias("sa"))
    sb = strength.select(F.col("node").alias("v"), F.col("s").alias("sb"))
    return (
        edges.join(sa, "u")
        .join(sb, "v")
        .select(
            F.col("u").alias("node_a"),
            F.col("v").alias("node_b"),
            F.col("w").cast("bigint").alias("cooccur"),
            F.round(
                F.col("w")
                / F.sqrt((F.col("sa") * F.col("sb")).cast("double")),
                6,
            ).alias("cosine"),
        )
    )


def _copurchase_edges_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`_copurchase_edges` with the support weight retained."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .agg(F.countDistinct("a.l_orderkey").alias("w"))
        .filter(F.col("w") >= 2)
    )


@register(
    "k_anonymity_report",
    oracle="""
    WITH classes AS (
      SELECT c_nationkey,
             c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS INT) AS bal_band,
             count(*) AS class_size
      FROM customer
      GROUP BY 1, 2, 3
    )
    SELECT c_nationkey, c_mktsegment, bal_band, class_size
    FROM classes
    WHERE class_size < 5
    """,
    tags=("governance", "privacy", "k-anonymity"),
)
def q_k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-identification risk report: quasi-identifier equivalence
    classes (nation × market segment × coarsened balance band)
    smaller than k=5 — the rows a release would have to suppress or
    generalize further before publication (Sweeney's k-anonymity;
    the same report drives the generalize/suppress loop in any
    release pipeline). Pure groupBy-HAVING: one shuffle on the
    quasi-identifier key with map-side partial counts; at 100 TB the
    class table is cardinality-bounded by the QI domain, not the row
    count, so the risk scan stays dim-sized no matter how large the
    release is. Complements `pii_redaction` (column-level masking)
    with row-level linkage risk."""
    _utc(spark)
    return (
        _t(spark, sf_dir, "customer")
        .groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("int").alias("bal_band"),
        )
        .agg(F.count("*").alias("class_size"))
        .filter(F.col("class_size") < 5)
    )


@register(
    "l_diversity_report",
    oracle="""
    WITH classes AS (
      SELECT c_nationkey,
             CAST(floor(c_acctbal / 1000) AS INT) AS bal_band,
             count(*) AS class_size,
             count(DISTINCT c_mktsegment) AS diversity
      FROM customer
      GROUP BY 1, 2
    )
    SELECT c_nationkey, bal_band,
           CAST(class_size AS BIGINT) AS class_size,
           CAST(diversity AS BIGINT) AS diversity
    FROM classes
    WHERE diversity < 3
    """,
    tags=("governance", "privacy", "l-diversity"),
)
def q_l_diversity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The attribute-disclosure companion to `k_anonymity_report`
    (Machanavajjhala et al.'s l-diversity): a QI class can satisfy
    k-anonymity and still leak — if all k members share the SAME
    sensitive value, linking someone to the class reveals it. Here
    the quasi-identifier is (nation × balance band), the sensitive
    attribute is market segment, and the report lists classes with
    fewer than l=3 distinct sensitive values — what a release would
    generalize further even after passing the k-check. One shuffle
    on the QI key with a distinct-count aggregate; class table is
    QI-domain-bounded at any row count, like the k-report."""
    _utc(spark)
    return (
        _t(spark, sf_dir, "customer")
        .groupBy(
            "c_nationkey",
            F.floor(F.col("c_acctbal") / 1000).cast("int").alias("bal_band"),
        )
        .agg(
            F.count("*").cast("bigint").alias("class_size"),
            F.countDistinct("c_mktsegment").cast("bigint").alias("diversity"),
        )
        .filter(F.col("diversity") < 3)
    )


@register(
    "t_closeness_audit",
    oracle="""
    WITH cust AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS INT) AS band
      FROM customer),
    bands AS (SELECT band, count(*) AS gcnt FROM cust GROUP BY band),
    gb AS (
      SELECT band,
             sum(gcnt) OVER (ORDER BY band ROWS UNBOUNDED PRECEDING) AS gcum,
             sum(gcnt) OVER () AS n_total,
             count(*) OVER () AS m,
             row_number() OVER (ORDER BY band) AS r
      FROM bands),
    classes AS (
      SELECT c_nationkey, c_mktsegment, count(*) AS n_c
      FROM cust GROUP BY 1, 2),
    cc AS (
      SELECT c_nationkey, c_mktsegment, band, count(*) AS ccnt
      FROM cust GROUP BY 1, 2, 3),
    grid AS (
      SELECT c.c_nationkey, c.c_mktsegment, c.n_c,
             g.band, g.gcum, g.n_total, g.m, g.r,
             coalesce(cc.ccnt, 0) AS ccnt
      FROM classes c
      CROSS JOIN gb g
      LEFT JOIN cc ON cc.c_nationkey = c.c_nationkey
                  AND cc.c_mktsegment = c.c_mktsegment
                  AND cc.band = g.band),
    cum AS (
      SELECT *,
             sum(ccnt) OVER (PARTITION BY c_nationkey, c_mktsegment
                             ORDER BY band ROWS UNBOUNDED PRECEDING)
               AS ccum
      FROM grid),
    emd AS (
      SELECT c_nationkey, c_mktsegment, n_c,
             sum(abs((1000000 * ccum) // n_c
                     - (1000000 * gcum) // n_total)) // (max(m) - 1)
               AS emd_micro
      FROM cum WHERE r < m GROUP BY 1, 2, 3)
    SELECT c_nationkey, c_mktsegment,
           CAST(n_c AS BIGINT) AS class_size,
           CAST(emd_micro AS BIGINT) AS emd_micro,
           emd_micro >= 150000 AS t_violation
    FROM emd
    """,
    tags=("governance", "privacy", "t-closeness", "emd"),
)
def q_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third leg of the privacy-release triple (Li et al. 2007's
    t-closeness, after `k_anonymity_report` and
    `l_diversity_report`): a QI class can be k-anonymous AND
    l-diverse yet still leak if its sensitive-value DISTRIBUTION
    differs sharply from the global one (all-rich-members in a class
    reveals wealth even across 3 distinct bands). For the ordered
    sensitive attribute (account-balance band) the distance is the
    Earth Mover's Distance, which for ordered categories reduces to
    the mean absolute difference of cumulative distributions:
    EMD = (1/(m-1)) * sum_j |cumP_j - cumQ_j|.

    Integer determinism: both cumulative fractions are quantized to
    micro-units with floor division BEFORE differencing
    ((1e6*ccum) DIV n_c), so every term is exact BIGINT arithmetic —
    identical on any engine and partitioning, within 1 micro-unit of
    the true EMD per term, and overflow-safe at any corpus size
    (1e6 * cumulative_count stays < 2^63 up to ~9e12 rows, where the
    unreduced cross-product formulation would overflow at ~1e9).

    Scale shape: the band domain (m ~ 11 values) broadcasts to every
    class — the expansion is QI-domain x attribute-domain, bounded
    regardless of row count; the per-class cumulative window
    partitions by class. One wide shuffle on the QI key, everything
    else dim-sized."""
    _utc(spark)
    from pyspark.sql import Window

    cust = _t(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("int").alias("band"),
    )
    wb = Window.orderBy("band")
    whole = wb.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    bands = (
        cust.groupBy("band")
        .agg(F.count("*").alias("gcnt"))
        .select(
            "band",
            F.sum("gcnt")
            .over(wb.rowsBetween(Window.unboundedPreceding, 0))
            .alias("gcum"),
            F.sum("gcnt").over(whole).alias("n_total"),
            F.count("*").over(whole).alias("m"),
            F.row_number().over(wb).alias("r"),
        )
    )
    classes = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("n_c")
    )
    cc = cust.groupBy("c_nationkey", "c_mktsegment", "band").agg(
        F.count("*").alias("ccnt")
    )
    grid = (
        classes.crossJoin(F.broadcast(bands))  # band domain: ~11 rows
        .join(cc, ["c_nationkey", "c_mktsegment", "band"], "left")
        .withColumn("ccnt", F.coalesce("ccnt", F.lit(0)))
    )
    wc = Window.partitionBy("c_nationkey", "c_mktsegment").orderBy("band")
    cum = grid.withColumn(
        "ccum", F.sum("ccnt").over(wc.rowsBetween(Window.unboundedPreceding, 0))
    )
    emd = (
        cum.filter(F.col("r") < F.col("m"))
        .groupBy("c_nationkey", "c_mktsegment", "n_c")
        .agg(
            F.expr(
                "sum(abs((1000000 * ccum) DIV n_c"
                "     - (1000000 * gcum) DIV n_total)) DIV (max(m) - 1)"
            ).alias("emd_micro")
        )
    )
    return emd.select(
        "c_nationkey",
        "c_mktsegment",
        F.col("n_c").cast("bigint").alias("class_size"),
        F.col("emd_micro").cast("bigint").alias("emd_micro"),
        (F.col("emd_micro") >= 150000).alias("t_violation"),
    )
