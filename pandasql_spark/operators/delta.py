"""Snapshot diff — what changed between two corpus snapshots.

The incremental-crawl primitive: yesterday's corpus vs today's, keyed
by a stable document id. Output is one row per key that appears in
either snapshot, labeled:

- ``added``     — key only in the new snapshot
- ``removed``   — key only in the old snapshot
- ``changed``   — key in both, content fingerprint differs
- ``unchanged`` — key in both, fingerprint equal

Scale shape: the content comparison NEVER ships content. Each side is
reduced map-side to (key, md5-of-content) — 16 bytes per row on the
wire regardless of document size — then a single full-outer equi-join
on the key (co-partitionable; AQE handles the residual skew). On an
incremental pipeline the old side's fingerprints are a by-product of
the previous run (persist them; ``fingerprints`` is that entry point)
so the diff costs one scan of the NEW data plus a hash-sized join.

Reference scope note: the reference engine (pandasql) has no multi-
snapshot or diff surface at all; part of the beyond-reference
LLM-pipeline inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fingerprints(
    df: DataFrame, key_col: str, content_cols: list[str]
) -> DataFrame:
    """(key, fp): md5 over the concatenated content columns. The unit
    separator (\\x1f) keeps ("ab","c") distinct from ("a","bc"), and
    NULLs are coalesced to a \\x00 sentinel BEFORE concat_ws — both
    Spark and DuckDB silently SKIP nulls (separator included) in
    concat_ws, which would collide (NULL,"x") with ("x",NULL)."""
    if not content_cols:
        raise ValueError("content_cols must be non-empty")
    return df.select(
        F.col(key_col).alias("key"), content_fingerprint(content_cols).alias("fp")
    )


def content_fingerprint(content_cols: list[str]):
    """The shared fingerprint Column: md5 over \\x1f-joined content
    with NULL→\\x00 sentinels. ONE definition — snapshot_diff and
    scd2_merge must never diverge on the sentinel scheme, or histories
    computed across a change would mis-detect every row as changed."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in content_cols
    ]
    return F.md5(F.concat_ws("\x1f", *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    content_cols: list[str],
) -> DataFrame:
    """(key, status) for every key in either snapshot; see module doc.
    ``key_col`` must be unique per snapshot (enforce upstream — a
    duplicate key would fan out the join)."""
    o = fingerprints(old, key_col, content_cols).withColumnRenamed("fp", "fp_old")
    n = fingerprints(new, key_col, content_cols).withColumnRenamed("fp", "fp_new")
    joined = o.join(n, on="key", how="full_outer")
    status = (
        F.when(F.col("fp_old").isNull(), F.lit("added"))
        .when(F.col("fp_new").isNull(), F.lit("removed"))
        .when(F.col("fp_old") == F.col("fp_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select("key", status.alias("status"))


def apply_changes(
    current: DataFrame,
    changes: DataFrame,
    key_col: str,
    op_col: str = "op",
    upsert_op: str = "upsert",
    delete_op: str = "delete",
) -> DataFrame:
    """CDC apply: fold a change feed into a snapshot, producing the next
    snapshot. ``changes`` carries the snapshot's columns plus ``op_col``
    (``upsert`` inserts-or-replaces by key; ``delete`` drops the key).
    An unknown op value fails the job at evaluation time (raise_error in
    the plan — no extra validation pass).

    Scale shape: untouched rows are selected by ONE left-anti join of
    the snapshot against the change keys (broadcast when the delta is
    small — the common incremental case; AQE decides), then the upserts
    union in. Current-side content is never shuffled against content,
    only against keys. At most one change row per key is the caller's
    contract (a multi-row feed should be pre-collapsed to the last op
    per key; enforcing it here would cost a window over the feed)."""
    checked_op = F.when(
        F.col(op_col).isin(upsert_op, delete_op), F.col(op_col)
    ).otherwise(
        F.raise_error(F.concat(F.lit("apply_changes: unknown op "), F.col(op_col)))
    )
    changes = changes.withColumn(op_col, checked_op)
    survivors = current.join(
        changes.select(F.col(key_col)), on=key_col, how="left_anti"
    )
    upserts = changes.filter(F.col(op_col) == upsert_op).drop(op_col)
    return survivors.unionByName(upserts)


def scd2_merge(
    history: DataFrame,
    snapshot: DataFrame,
    key_col: str,
    content_cols: list[str],
    as_of: int,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension type-2 merge: fold a full new snapshot
    into a versioned history table.

    ``history`` rows carry ``valid_from`` and nullable ``valid_to``
    (NULL = currently open). Against the ``snapshot`` taken at
    ``as_of`` (any monotone integer clock — epoch seconds, batch id):

    - open rows whose key vanished or whose content changed close
      (``valid_to = as_of``);
    - added/changed keys insert a fresh open row
      (``valid_from = as_of``);
    - unchanged open rows and already-closed rows pass through.

    Scale shape: change detection compares md5 fingerprints, never
    content against content. Two equi-joins, each [full content side] ×
    [16-byte (key, fp) side]: open×new-fps decides closes, new×open-fps
    decides inserts. The fp side is delta-sized in steady state and
    broadcast/AQE-handled. Open keys and snapshot keys must be unique
    per side (same contract as :func:`snapshot_diff`).

    Determinism: pure column arithmetic — the result is a function of
    the inputs, so retries/re-runs are idempotent given the same
    ``as_of``."""
    if not content_cols:
        raise ValueError("content_cols must be non-empty")
    if valid_from_col not in history.columns or valid_to_col not in history.columns:
        raise ValueError(
            f"history must carry {valid_from_col!r} and {valid_to_col!r}"
        )

    fp_col = content_fingerprint(content_cols)

    # ONE history pass for closes + pass-throughs: the old shape
    # filtered history into closed/open branches and unioned
    # closed ∪ closed_now ∪ still_open, so the open⋈new_fp join
    # subtree executed once per consuming branch — the r15 file-byte
    # probe read the q83 inputs 9× (each output branch re-derived its
    # join). Folding the close decision into a conditional valid_to
    # over ALL history rows (closed rows join the broadcast fp table
    # too — one hash probe each, no shuffle; their valid_to is guarded
    # by the isNull test) makes the whole history side one scan, and
    # the insert side one scan per input: q83 probes at 6 = each
    # side's content pass + fp pass, the floor without caching full
    # content. Row-for-row identical output to the branch form.
    new_fp = snapshot.select(F.col(key_col), fp_col.alias("__fp_new"))
    open_fp = history.filter(F.col(valid_to_col).isNull()).select(
        F.col(key_col), fp_col.alias("__fp_old")
    )

    gone_or_changed = F.col("__fp_new").isNull() | (
        F.col("__fp_old") != F.col("__fp_new")
    )
    merged = (
        # fp only for OPEN rows: conditional expressions short-circuit
        # in codegen, so closed rows (the bulk of a mature history)
        # skip the content md5 entirely — they only pay the broadcast
        # hash probe. __fp_old is NULL for closed rows, which is safe:
        # every use below sits under the same valid_to-isNull guard.
        history.withColumn(
            "__fp_old", F.when(F.col(valid_to_col).isNull(), fp_col)
        )
        .join(new_fp, on=key_col, how="left")
        .withColumn(
            valid_to_col,
            F.when(
                F.col(valid_to_col).isNull() & gone_or_changed,
                F.lit(as_of).cast("long"),
            ).otherwise(F.col(valid_to_col)),
        )
        .drop("__fp_old", "__fp_new")
    )

    # inserts: new content × open fingerprints
    n = snapshot.withColumn("__fp_new", fp_col).join(
        open_fp, on=key_col, how="left"
    )
    inserts = (
        n.filter(
            F.col("__fp_old").isNull()
            | (F.col("__fp_old") != F.col("__fp_new"))
        )
        .drop("__fp_old", "__fp_new")
        .withColumn(valid_from_col, F.lit(as_of).cast("long"))
        .withColumn(valid_to_col, F.lit(None).cast("long"))
    )

    return merged.unionByName(inserts.select(*merged.columns))


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    content_cols: list[str],
) -> DataFrame:
    """(status, n) rollup of :func:`snapshot_diff` — the monitoring
    number an incremental pipeline alerts on (churn rate)."""
    return (
        snapshot_diff(old, new, key_col, content_cols)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )
