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
graft per batch — compaction (a rebuild) amortizes file-count growth,
the same trade as any LSM-shaped ingest path.
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
            # but mixed physical types cost every later reader a cast)
            batch_df.write.option(
                "parquet.outputTimestampType", "TIMESTAMP_MICROS"
            ).mode("overwrite").parquet(tmp)
            for i, f in enumerate(sorted(glob.glob(os.path.join(tmp, "*.parquet")))):
                os.replace(
                    f,
                    os.path.join(fact_dir, f"ingest-{epoch_id:05d}-{i:04d}.parquet"),
                )
            shutil.rmtree(tmp)
            open(marker, "w").close()
        actions_log.append(
            refresh_graft_layout(spark, sf_dir, n_buckets, tables=tables)
        )

    writer = stream_df.writeStream.foreachBatch(_sink).trigger(availableNow=True)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start(), actions_log
