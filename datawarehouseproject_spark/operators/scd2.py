"""SCD Type-2 maintenance as a set-based DataFrame operator.

Re-derives the reference's ``SP_ETL_SCD_Update_Product``
(db_staging.sql:4929-4991) — a 5-statement MySQL dataflow with an
UPDATE and a scratch table — as pure joins + unions over immutable
Parquet. Exact semantic parity (SURVEY.md §2.9 quirks 2-3):

- **Key asymmetry**: membership (new-key detection) uses the single
  business key (``TEN``, db_staging.sql:4951); change tracking and
  expiry use the compound key (``TEN``,``LINK``)
  (db_staging.sql:4958-4988).
- **Sequencing**: the reference inserts brand-new keys FIRST, then
  detects changes against the post-insert history. With same-TEN /
  different-LINK staging rows this fans out (a new row can be
  expired in the same run) — reproduced by unioning the new rows
  into history before change detection.
- **NULL-unsafe compare**: attribute diff uses ``<>`` — NULLs never
  register as changed. We use ``!=``, not a negated ``eqNullSafe``.
- -1 sentinels flow through untouched (they are real values here).

Scale design: history is assumed large (years of daily runs at
100 TB); staging is one day. Both joins are equi-joins on the
business key — Catalyst/AQE picks broadcast when staging is small.
The changed-keys intermediate (the reference's ``EXPIRED_KEYS``
scratch table) is a lineage-truncated (lazily localCheckpointed)
DataFrame reused by three downstream branches. The rewrite only touches *current* rows; closed history
partitions are carried over unchanged — when the history table is
partitioned by an ``is_current`` flag or EXPIRED_AT date, only the
current partition is rewritten (see :func:`..sources.parquet
.overwrite_atomic` for the temp-path swap).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.cleaning import SCD_OPEN

AUDIT_COLS = ("CREATED_AT", "UPDATED_AT", "EXPIRED_AT")


@dataclass
class Scd2Result:
    """Output of one SCD2 run.

    ``history`` is the full rewritten history; the count fields mirror
    the reference's OUT params (p_RowsInput / p_RowsInserted /
    p_RowsUpdated, db_staging.sql:4936-4990) and are computed lazily
    via :meth:`metrics` so the happy path stays one job.
    """

    history: DataFrame
    new_rows: DataFrame
    reinserted: DataFrame
    expired: DataFrame
    staging: DataFrame

    def metrics(self) -> dict[str, int]:
        # ONE job for all four counts (tagged union + groupBy) instead
        # of four count() jobs — the branches share the cached staging
        # / post-insert-history frames, so each is a cheap re-filter
        def tagged(df: DataFrame, t: str) -> DataFrame:
            return df.select(F.lit(t).alias("__t"))

        counts = dict(
            tagged(self.staging, "input")
            .unionAll(tagged(self.new_rows, "new"))
            .unionAll(tagged(self.reinserted, "reinserted"))
            .unionAll(tagged(self.expired, "expired"))
            .groupBy("__t")
            .count()
            .collect()
        )
        return {
            "rows_input": counts.get("input", 0),
            "rows_inserted": counts.get("new", 0) + counts.get("reinserted", 0),
            "rows_updated": counts.get("expired", 0),
        }


def as_of(history: DataFrame, ts: str) -> DataFrame:
    """Point-in-time reconstruction (time travel): the rows that were
    CURRENT at ``ts`` — ``CREATED_AT <= ts < EXPIRED_AT``.

    This is the query SCD2 history exists to answer ("what did the
    catalog look like last Tuesday?"); the open sentinel 9999-12-31
    makes live rows satisfy the upper bound naturally. A pure filter:
    when history is partitioned by IS_CURRENT / EXPIRED_AT date,
    partition pruning bounds the scan.
    """
    t = F.to_timestamp(F.lit(ts))
    return history.filter((F.col("CREATED_AT") <= t) & (F.col("EXPIRED_AT") > t))


def diff_between(
    history: DataFrame,
    ts_a: str,
    ts_b: str,
    track_keys: tuple[str, ...] = ("TEN", "LINK"),
    compare_cols: tuple[str, ...] = (
        "GIA_CU",
        "GIA_MOI",
        "KICH_THUOC_MAN_HINH",
        "RAM",
        "BO_NHO",
    ),
) -> DataFrame:
    """Change summary between two instants — "what changed between
    Tuesday and Friday": full-outer join of the two :func:`as_of`
    reconstructions on the track keys, classifying each key as
    ``added`` (only in B), ``removed`` (only in A), or ``changed``
    (present in both with any compare column differing — the same
    NULL-unsafe ``!=`` the SCD itself uses). Unchanged keys are
    dropped. Returns ``(*track_keys, change_type)``.
    """
    a = as_of(history, ts_a).alias("a")
    b = as_of(history, ts_b).alias("b")
    cond = None
    for k in track_keys:
        c = F.col(f"a.{k}") == F.col(f"b.{k}")
        cond = c if cond is None else cond & c
    joined = a.join(b, cond, "full_outer")
    a_key0 = F.col(f"a.{track_keys[0]}")
    b_key0 = F.col(f"b.{track_keys[0]}")
    change = (
        F.when(a_key0.isNull(), F.lit("added"))
        .when(b_key0.isNull(), F.lit("removed"))
        .when(_neq_any("a", "b", list(compare_cols)), F.lit("changed"))
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"a.{k}"), F.col(f"b.{k}")).alias(k)
                for k in track_keys
            ],
            "change_type",
        )
    )


def _neq_any(left: str, right: str, cols: list[str]) -> Column:
    """OR-chain of NULL-unsafe ``!=`` over compare columns."""
    out: Column | None = None
    for c in cols:
        neq = F.col(f"{left}.{c}") != F.col(f"{right}.{c}")
        out = neq if out is None else out | neq
    assert out is not None
    return out


def scd2_apply(
    staging: DataFrame,
    history: DataFrame | None,
    member_key: str = "TEN",
    track_keys: tuple[str, ...] = ("TEN", "LINK"),
    compare_cols: tuple[str, ...] = (
        "GIA_CU",
        "GIA_MOI",
        "KICH_THUOC_MAN_HINH",
        "RAM",
        "BO_NHO",
    ),
    now: str | None = None,
    open_sentinel: str = SCD_OPEN,
) -> Scd2Result:
    """Apply one staging batch to the SCD2 history.

    ``staging`` carries the payload columns only (no audit columns);
    ``history`` carries payload + CREATED_AT/UPDATED_AT/EXPIRED_AT
    (None for a first run). ``now`` is an ISO timestamp string —
    parameterized rather than ``current_timestamp()`` so runs are
    deterministic and replayable (the reference stamps NOW() at
    execution time, db_staging.sql:4948).
    """
    now_ts = F.to_timestamp(F.lit(now)) if now else F.current_timestamp()
    open_ts = F.to_timestamp(F.lit(open_sentinel))
    payload_cols = staging.columns

    # staging feeds four branches (anti-join, change scan, re-insert,
    # metrics) — materialize it so upstream lineage (often a full
    # clean/aggregate pipeline) runs once, mirroring the reference's
    # materialized PRODUCTS_TRANSFORM table.  LAZY localCheckpoint
    # instead of cache (r15, measured): a cached frame keeps FULL
    # lineage in every consumer's plan and AQE re-materializes its
    # exchange cascade per consumer job — the same finding as r14's
    # incremental_dedup.  eager=False because the caller's first real
    # action (metrics() or the query's sink) materializes the marked
    # RDD anyway; EAGER checkpoints here measured +1.2 s on
    # pipeline_day (three materialize-only jobs).  Net, with the
    # pipeline.load_dims twins: two-day replay 183 -> 136 jobs,
    # isolated pipeline_two_day 15.8 -> 13.6 s, scd2_diff 2.6 -> 2.0 s.
    staging = staging.localCheckpoint(eager=False)

    def as_current(df: DataFrame) -> DataFrame:
        return (
            df.select(*payload_cols)
            .withColumn("CREATED_AT", now_ts)
            .withColumn("UPDATED_AT", now_ts)
            .withColumn("EXPIRED_AT", open_ts)
        )

    hist_cols = payload_cols + list(AUDIT_COLS)
    if history is None:
        history = staging.sparkSession.createDataFrame(
            [], as_current(staging.limit(0)).schema
        )
    history = history.select(*hist_cols)

    current0 = history.filter(F.col("EXPIRED_AT") == open_ts)

    # 1. Brand-new members: staging TEN with no current history row
    #    (left anti == the reference's LEFT JOIN ... WHERE t.TEN IS
    #    NULL, db_staging.sql:4940-4953).
    new_rows = as_current(
        staging.join(
            current0.select(member_key).distinct(), on=member_key, how="left_anti"
        )
    )

    # 2. Post-insert history; change detection runs against THIS state
    #    (reference sequencing — the new-key INSERT precedes the
    #    EXPIRED_KEYS scan).
    # hist1 feeds the change scan plus three output branches;
    # materialized for the same reason (the reference's history table
    # is physical).  Same cache->localCheckpoint measurement as
    # staging above.
    hist1 = history.unionByName(new_rows).localCheckpoint(eager=False)
    current1 = hist1.filter(F.col("EXPIRED_AT") == open_ts)

    # 3. Changed keys (the EXPIRED_KEYS scratch table,
    #    db_staging.sql:4957-4969): current ⋈ staging on the member
    #    key with a NULL-unsafe any-attribute-differs residual; keys
    #    taken from the HISTORY side (t.TEN, t.LINK).
    changed_keys = (
        current1.alias("t")
        .join(staging.alias("s"), F.col(f"t.{member_key}") == F.col(f"s.{member_key}"))
        .filter(_neq_any("t", "s", list(compare_cols)))
        .select(*[F.col(f"t.{k}").alias(k) for k in track_keys])
        .distinct()
        # the EXPIRED_KEYS scratch table (db_staging.sql:4957);
        # localCheckpoint per the same r15 measurement as staging
        .localCheckpoint(eager=False)
    )

    # 4. Expire: current rows matching changed keys on the compound
    #    key get EXPIRED_AT=UPDATED_AT=now (db_staging.sql:4971-4976).
    #    One marker join replaces the semi+anti pair — expired and
    #    untouched are filters over the same join output.
    marker = changed_keys.withColumn("__chg", F.lit(1))
    cur_marked = current1.join(marker, on=list(track_keys), how="left")
    expired = (
        cur_marked.filter(F.col("__chg") == 1)
        .withColumn("EXPIRED_AT", now_ts)
        .withColumn("UPDATED_AT", now_ts)
        .select(*hist_cols)
    )
    untouched_current = cur_marked.filter(F.col("__chg").isNull()).select(*hist_cols)
    # negated null-safe equality: a NULL EXPIRED_AT (malformed ingest)
    # lands in `closed` instead of vanishing — `!= open_ts` would drop
    # it from both branches silently
    closed = hist1.filter(~F.col("EXPIRED_AT").eqNullSafe(open_ts)).select(*hist_cols)

    # 5. Re-insert fresh current versions for the changed keys
    #    (db_staging.sql:4978-4988).
    reinserted = as_current(
        staging.join(marker, on=list(track_keys), how="left")
        .filter(F.col("__chg") == 1)
        .drop("__chg")
    )

    new_history = (
        closed.unionByName(untouched_current)
        .unionByName(expired)
        .unionByName(reinserted)
    )
    return Scd2Result(
        history=new_history,
        new_rows=new_rows,
        reinserted=reinserted,
        expired=expired,
        staging=staging,
    )
