"""Streaming windowed NDV over Structured Streaming.

Design (SURVEY.md §2.2 'streaming'): sketches are order-insensitive
monoids, so late data is just another merge — no retraction logic. Each
micro-batch reduces to per-(window, key) partial sketches via the same
two-phase harness as batch, then folds into a persisted sketch-table
(parquet) keyed by (window_start, keys): read current state, union, write
back. ``withWatermark`` bounds how late events may arrive before their
window's sketch row is frozen.

At cluster scale the state table would be an Iceberg table with
MERGE INTO; the parquet swap here is the sandbox stand-in with the same
semantics (atomic directory replace).
"""

from __future__ import annotations

import os
import shutil
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..core.hll import HLL
from ..spark.agg import hll_sketch
from ..spark.blocks import checkpoint_rdd_id, unpersist_by_id
from ..spark.functions import hll_cardinality_udf


def merge_sketch_tables(
    current: DataFrame | None, incoming: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Union-merge two sketch tables on ``keys`` (full outer; sketches
    union where both sides have rows)."""
    from ..spark.agg import eq_null_safe_cond, hll_rollup
    from ..spark.blocks import checkpoint_rdd_id

    if current is None:
        return incoming
    both = current.select(*keys, "sketch", "rows_seen").unionByName(
        incoming.select(*keys, "sketch", "rows_seen")
    ).localCheckpoint()
    # the union feeds TWO aggregates (rollup + rows_seen sum); without
    # the checkpoint the whole upstream subtree — batch partials AND the
    # state parquet read — executed twice per merge (the same
    # dual-consumer shape hll_sketch_explicit checkpoints for). The
    # checkpoint's RDD id rides on the result as ``_retire_ckpt_id`` so
    # the caller can release the blocks once the result is materialized
    # (js_hll_spark.spark.blocks.unpersist_by_id — both in-repo callers
    # do; a leaked id costs one bounded sketch-table copy).
    merged = hll_rollup(both, keys, estimate=False)
    rows = both.groupBy(*keys).agg(F.sum("rows_seen").alias("rows_seen"))
    out = merged.join(rows, eq_null_safe_cond(merged, rows, keys)).select(
        *[merged[k] for k in keys],
        merged["sketch"],
        rows["rows_seen"],
    )
    out._retire_ckpt_id = checkpoint_rdd_id(both)
    return out


def streaming_ndv(
    stream: DataFrame,
    value_col: str,
    *,
    ts_col: str,
    window: str = "1 hour",
    keys: Sequence[str] = (),
    state_dir: str,
    watermark: str | None = "2 hours",
    log2m: int = 12,
    checkpoint_dir: str | None = None,
    engine: str = "auto",
    retention: str | None = None,
):
    """Start a foreachBatch streaming query maintaining a per-window NDV
    sketch table under ``state_dir``. Returns the StreamingQuery.

    ``watermark=None`` skips withWatermark (foreachBatch merges late data
    regardless — a late event is just another union; the watermark only
    documents the freshness bound). ``engine='explicit'`` builds TRUE
    EXPLICIT-mode sketches (exact hash sets until the explicit
    threshold), whose estimates are exact distinct counts — the oracle
    tier; 'sql'/'python' build dense registers (the fixed-bytes scale
    tier). Read estimates any time with
    ``read_ndv_state(spark, state_dir)``.

    ``retention`` (e.g. ``"7 days"``) bounds the state table: after each
    merge, window rows older than ``max(window_start) - retention`` are
    dropped. Without it state grows one sketch row per (window, key)
    FOREVER — fine for a bounded replay, a leak on an unbounded 100 TB
    stream. Retention is applied relative to the max ingested window
    (event time), not wall clock, so a paused-and-resumed stream never
    drops rows it would still update. Default None keeps everything
    (the oracle tier replays bounded history and checks every window).
    """
    spark = stream.sparkSession
    keys = list(keys)
    state_path = os.path.join(state_dir, "state")
    checkpoint_dir = checkpoint_dir or os.path.join(state_dir, "_checkpoint")

    windowed = (
        stream.withWatermark(ts_col, watermark) if watermark else stream
    )

    # replay marker lives INSIDE the state dir (Spark hides underscore
    # files from parquet file listings), so it swaps atomically WITH the
    # state: a crash between rename(tmp -> state) and a separate marker
    # write used to double-apply the batch on restart, permanently
    # inflating rows_seen (ADVICE r3 — exactly the failure mode the
    # marker exists to prevent; ndv itself stayed correct since register
    # union is idempotent)
    marker_name = "_applied_batch"

    def _query_id() -> str:
        # the streaming checkpoint's stable query id ("id" persists for
        # the checkpoint's lifetime; "runId" changes per restart). A
        # RESET checkpoint mints a new id, which must invalidate the
        # replay marker: batch ids restart at 0 after a reset, and a
        # marker compared on batch id alone would silently drop the
        # first N batches of genuinely NEW data as "replays".
        import json as _json

        try:
            with open(os.path.join(checkpoint_dir, "metadata")) as f:
                return str(_json.load(f).get("id", ""))
        except (OSError, ValueError):
            return ""

    def recover_state() -> None:
        # crash-safe swap recovery: a crash between rename(state -> old)
        # and rename(tmp -> state) leaves only .old — restore it. A crash
        # AFTER rename(tmp -> state) but before rmtree leaves BOTH: the
        # orphaned .old must go, or every later swap's rename(state ->
        # old) hits ENOTEMPTY and the stream wedges permanently. Stale
        # .tmp* dirs from aborted writes are garbage either way.
        old = state_path + ".old"
        if not os.path.exists(state_path) and os.path.exists(old):
            os.rename(old, state_path)
        elif os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)
        parent = os.path.dirname(state_path)
        base = os.path.basename(state_path)
        for entry in os.listdir(parent) if os.path.isdir(parent) else ():
            if entry.startswith(base + ".tmp"):
                shutil.rmtree(os.path.join(parent, entry), ignore_errors=True)

    def _last_applied() -> tuple[int, str]:
        """(batch_id, query_id) of the last applied batch; query_id is
        '' for markers written before it was recorded (those keep the
        legacy batch-id-only semantics)."""
        try:
            with open(os.path.join(state_path, marker_name)) as f:
                lines = f.read().strip().splitlines()
                return int(lines[0]), lines[1] if len(lines) > 1 else ""
        except (OSError, ValueError, IndexError):
            pass
        # legacy layout (pre-r4): marker sat beside the state dir; a
        # state dir written by older code must not lose its replay
        # protection across the upgrade. Honored ONLY while that state
        # still exists — after an operator wipes state/ to recompute
        # from scratch, a stale sibling marker must not silently drop
        # the replayed batches (the first swap migrates it away).
        if os.path.isdir(state_path):
            try:
                with open(os.path.join(state_dir, marker_name)) as f:
                    return int(f.read().strip()), ""
            except (OSError, ValueError):
                pass
        return -1, ""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        # recovery FIRST: a mid-swap crash must be repaired even while
        # only empty micro-batches arrive, or readers see no state dir
        # until the next non-empty batch
        recover_state()
        if batch_df.isEmpty():
            return
        qid = _query_id()
        last_batch, last_qid = _last_applied()
        if batch_id <= last_batch and (not last_qid or last_qid == qid):
            # replay after a crash past the swap but before the offset
            # commit: the union is idempotent on registers, but
            # rows_seen sums — re-applying would inflate it permanently.
            # A DIFFERENT query id means the checkpoint was reset and
            # batch numbering restarted — that is new data, not a replay
            return
        with_window = batch_df.withColumn(
            "window_start", F.window(ts_col, window).start
        )
        partials = hll_sketch(
            with_window,
            value_col,
            by=["window_start", *keys],
            log2m=log2m,
            estimate=False,
            engine=engine,
        )
        current = None
        if os.path.exists(state_path):
            current = spark.read.parquet(state_path)
        merged = merge_sketch_tables(
            current, partials, ["window_start", *keys]
        )
        retire = [getattr(merged, "_retire_ckpt_id", None)]
        if retention is not None:
            # bound state by EVENT time: drop windows older than the
            # newest window seen minus the retention horizon (one
            # broadcast scalar subquery — no driver collect). Three
            # hardenings from review:
            # - materialize merged first, or the horizon aggregate and
            #   the filter would each re-run the whole merge subtree
            #   (state read + rollup UDF) — 2x the batch cost
            # - clamp the anchor to wall-clock now: a single corrupt
            #   far-future timestamp would otherwise advance the horizon
            #   past every legitimate window and wipe the accumulated
            #   state in one swap (the clamp only ever REDUCES deletion;
            #   event-time replays/backfills keep max < now and are
            #   unaffected)
            # - keep the null-window row (events with null ts), which
            #   merge_sketch_tables deliberately preserves via
            #   eqNullSafe — a plain >= filter would drop it as NULL
            merged = merged.localCheckpoint()
            retire.append(checkpoint_rdd_id(merged))
            wcol = merged.schema["window_start"].dataType
            horizon = merged.select(
                (
                    F.least(
                        F.max("window_start"),
                        F.current_timestamp().cast(wcol),
                    )
                    - F.expr(f"INTERVAL {retention}")
                ).alias("__h")
            )
            merged = merged.join(F.broadcast(horizon)).filter(
                (F.col("window_start") >= F.col("__h"))
                | F.col("window_start").isNull()
            ).drop("__h")
        try:
            tmp = state_path + f".tmp{batch_id}"
            merged.write.mode("overwrite").parquet(tmp)
            # marker goes into tmp BEFORE the swap — rename(tmp -> state)
            # is then atomic for state AND marker together; no crash
            # point can leave new state without its batch id. Line 2
            # pins the checkpoint's query id (see _query_id).
            with open(os.path.join(tmp, marker_name), "w") as f:
                f.write(f"{batch_id}\n{qid}")
            old = state_path + ".old"
            if os.path.exists(state_path):
                os.rename(state_path, old)
            os.rename(tmp, state_path)
            shutil.rmtree(old, ignore_errors=True)
            # migrate away the legacy sibling marker: the in-state marker
            # now owns replay protection, and a stale sibling would
            # otherwise outlive a future state reset
            try:
                os.remove(os.path.join(state_dir, marker_name))
            except OSError:
                pass
        finally:
            # the swap consumed the checkpoints — release them, or a
            # long-running stream pins one retired copy per micro-batch
            for rid in retire:
                unpersist_by_id(spark, rid)

    return (
        windowed.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def read_ndv_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current per-window NDV estimates from the persisted sketch table,
    as an EAGER SNAPSHOT: the rows are collected inside the retry loop,
    so a state swap between this call and the caller's action cannot
    fail the job on deleted files (a lazily-returned scan pins the old
    file listing — the retry would never re-enter). Collecting is
    bounded by design: the state table holds KB-sized sketch rows, one
    per (window, key), capped by the ``retention`` horizon. Retries
    cover the swap's brief rename window (state momentarily absent
    between the two renames)."""
    import time as _time

    path = os.path.join(state_dir, "state")
    last: Exception | None = None
    for _ in range(5):
        try:
            state = spark.read.parquet(path)
            rows = state.collect()  # eager: fails HERE, inside the retry
            snap = spark.createDataFrame(rows, schema=state.schema)
            return snap.withColumn(
                "ndv", hll_cardinality_udf("sketch")
            ).drop("sketch")
        except Exception as e:  # path/files momentarily absent mid-swap
            last = e
            _time.sleep(0.1)
    raise last
