"""Aligner table functions: ``align_minimap2`` (+ ``save_minimap2_index``,
``align_minimap2_sharded``), ``align_bowtie2`` family, ``bowtie2_available``.

Parity target: reference src/align_minimap2.cpp:15-109, src/
Minimap2Aligner.cpp:74-282, src/align_minimap2_sharded.cpp, src/
align_bowtie2.cpp, shared infra src/include/align_common.hpp:28-355.

The real backends are complete but environment-gated (the container ships
neither mappy nor bowtie2): ``MappyBackend`` is the full in-process
minimap2 path (temp-FASTA or .mmi index, eqx CIGAR, paired fragment mode,
reg_to_sam-shaped rows — its hit→row conversion is unit-tested with
duck-typed hits), and ``Bowtie2Runner`` is the full subprocess path
(bowtie2-build temp index, piped bowtie2, writer thread against pipe
deadlock, SAM-stdout parse) — driven end-to-end in tests by deterministic
stand-in binaries injected via ``bowtie2_path``/``bowtie2_build_path``.
``ExactMatchBackend`` (exact substring search emitting the 21-column
schema) additionally exercises the Spark plumbing differentially.

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

import os
import re
import shutil
import subprocess
import tempfile
import threading
import warnings
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


def mappy_available() -> bool:
    try:
        import mappy  # noqa: F401

        return True
    except ImportError:
        return False


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


class EqxExactBackend(ExactMatchBackend):
    """ExactMatchBackend with minimap2-faithful output shape: eqx CIGAR
    (``<n>=``), minimap2-style tags (AS=matching bases, NM/XM/XO/XG=0 for a
    perfect match, YT=UU, MD=<n>), and — like minimap2 — NO row for
    unmapped reads. Used by the golden gate query to drive the full
    align_minimap2 path against the reference .test expectations."""

    def align(self, read_id: str, seq: str) -> list[tuple]:
        rows = []
        for row in super().align(read_id, seq):
            if row[1] & 0x4:
                continue  # minimap2 emits nothing for unmapped reads
            n = len(seq)
            # stop = r_en: 0-based half-open end == 1-based inclusive end
            # (Minimap2Aligner.cpp:469-478), i.e. position + n - 1
            rows.append(
                row[:4] + (row[3] + n - 1,) + (row[5],) + (f"{n}=",) + row[7:10]
                + (n, -1, -1, -1, 0, 0, 0, 0, "UU", str(n), None)
            )
        return rows


_CIGAR_OP_RE = re.compile(r"(\d+)([MIDNSHP=X])")

# minimap2 mapopt extra flag bits (minimap2 minimap.h, public API)
MM_F_EQX = 0x4000000
MM_F_OUT_MD = 0x1000000


def cigar_stats(cigar: str) -> tuple[int, int, int, int]:
    """(mismatches XM, gap_opens XO, gap_extends XG, edit_distance NM) from an
    eqx CIGAR — the reference's compute_alignment_stats
    (Minimap2Aligner.cpp:32-70): X adds to XM+NM; each I/D run adds one gap
    open, len-1 extensions, len to NM; =/M/N/S/H/P contribute nothing."""
    xm = xo = xg = nm = 0
    for n, op in _CIGAR_OP_RE.findall(cigar or ""):
        ln = int(n)
        if op == "X":
            xm += ln
            nm += ln
        elif op in "ID":
            xo += 1
            xg += ln - 1 if ln > 1 else 0
            nm += ln
    return xm, xo, xg, nm


def minimap2_flags(
    strand: int,
    is_primary: bool,
    is_paired: bool = False,
    segment_idx: int = -1,
    mate_mapped: bool = False,
    mate_rev: bool = False,
) -> int:
    """SAM flags the reference computes in Minimap2Aligner.cpp:480-529
    (mapped records only — minimap2 emits no rows for unmapped reads)."""
    flags = 0
    if is_paired:
        flags |= 0x1
        flags |= 0x40 if segment_idx == 0 else 0x80
        if not mate_mapped:
            flags |= 0x8
        if mate_rev:
            flags |= 0x20
    if strand < 0:
        flags |= 0x10
    if not is_primary:
        flags |= 0x100
    return flags


def mappy_hit_to_row(
    read_id: str,
    hit,
    is_paired: bool = False,
    segment_idx: int = -1,
    mate_mapped: bool = False,
    mate_rev: bool = False,
    mate_ref: str | None = None,
    mate_pos: int = 0,
    tlen: int = 0,
    proper_frag: bool = False,
) -> tuple:
    """One mappy Alignment → the 21-column row, mirroring reg_to_sam
    (Minimap2Aligner.cpp:368-450). ``hit`` is duck-typed (ctg, r_st, r_en,
    strand, mapq, cigar_str, is_primary, NM, and optionally MD/mlen) so the
    conversion is testable with recorded hits when mappy is absent.

    Divergence from the reference, stated: mappy does not expose the DP
    score (reg->score) or the secondary score (reg->subsc), so tag_as
    carries ``mlen`` (matching bases) and tag_xs is -1."""
    reference = hit.ctg
    position = hit.r_st + 1  # 1-based
    stop = hit.r_en  # 0-based half-open end == 1-based inclusive end
    cigar = hit.cigar_str or "*"
    xm, xo, xg, _ = cigar_stats(cigar)
    nm = getattr(hit, "NM", None)
    if nm is None:
        _, _, _, nm = cigar_stats(cigar)
    flags = minimap2_flags(
        hit.strand, bool(hit.is_primary), is_paired, segment_idx, mate_mapped, mate_rev
    )
    if is_paired and proper_frag and mate_mapped:
        flags |= 0x2
    if is_paired and mate_mapped and mate_ref:
        out_mate_ref = "=" if mate_ref == reference else mate_ref
        out_mate_pos = mate_pos
    else:
        out_mate_ref, out_mate_pos = "*", 0
    if not is_paired:
        yt = "UU"
    elif mate_mapped and proper_frag:
        yt = "CP"
    elif mate_mapped:
        yt = "DP"
    else:
        yt = "UP"
    md = getattr(hit, "MD", None)
    return (
        read_id, flags, reference, position, stop, int(hit.mapq), cigar,
        out_mate_ref, out_mate_pos, tlen,
        # INT_TAGS: as, xs, ys, xn, xm, xo, xg, nm  (reference emits -1 for
        # the ones minimap2 lacks, Minimap2Aligner.cpp:413-420)
        int(getattr(hit, "mlen", 0)), -1, -1, -1, xm, xo, xg, int(nm),
        # STR_TAGS: yt, md, sa
        yt, md if md else None, None,
    )


class MappyBackend:
    """Real minimap2 alignment through the mappy Python binding
    (import-guarded: the container does not ship mappy, but the complete
    code path is here and unit-tested via duck-typed hits).

    Semantics mirror Minimap2Aligner.cpp:74-282: preset then k/w override,
    eqx CIGAR + MD on, best_n = max_secondary + 1, per-read secondary cap,
    paired reads through mappy's fragment mode with mate/tlen bookkeeping.
    ``subjects_or_index``: list[(name, seq)] → temp-FASTA index build
    (mm_idx_str equivalent); str → prebuilt .mmi/.fa loaded per task.
    """

    def __init__(
        self,
        subjects_or_index,
        preset: str = "sr",
        k: int | None = None,
        w: int | None = None,
        max_secondary: int = 5,
        eqx: bool = True,
    ):
        import mappy

        self.max_secondary = max_secondary
        self._tmp = None
        if isinstance(subjects_or_index, str):
            fn = subjects_or_index
        else:
            if not subjects_or_index:
                raise AlignerError("Cannot build index from empty subject list")
            self._tmp = tempfile.NamedTemporaryFile(
                "w", suffix=".fa", delete=False, prefix="mm2_subjects_"
            )
            for name, seq in subjects_or_index:
                if not seq:
                    raise AlignerError(f"Cannot build index: sequence '{name}' is empty")
                self._tmp.write(f">{name}\n{seq}\n")
            self._tmp.close()
            fn = self._tmp.name
        extra = MM_F_OUT_MD | (MM_F_EQX if eqx else 0)
        kwargs = dict(preset=preset, best_n=max_secondary + 1, extra_flags=extra)
        if k:
            kwargs["k"] = k
        if w:
            kwargs["w"] = w
        self.aligner = mappy.Aligner(fn, **kwargs)
        if not self.aligner:
            raise AlignerError(f"Failed to build/load minimap2 index: {fn}")

    def __del__(self):
        if self._tmp is not None:
            try:
                os.unlink(self._tmp.name)
            except OSError:
                pass

    def align(self, read_id: str, seq: str, seq2: str | None = None) -> list[tuple]:
        if seq2:
            return self._align_paired(read_id, seq or "", seq2)
        return self._align_single(read_id, seq or "")

    def _align_single(self, read_id: str, seq: str) -> list[tuple]:
        if not seq:
            return []  # minimap2 requires len > 0; unmapped emit no rows
        rows, secondary = [], 0
        for hit in self.aligner.map(seq, MD=True):
            if not hit.is_primary:
                if secondary >= self.max_secondary:
                    continue
                secondary += 1
            rows.append(mappy_hit_to_row(read_id, hit))
        return rows

    def _align_paired(self, read_id: str, seq1: str, seq2: str) -> list[tuple]:
        if not seq1 and not seq2:
            return []
        hits = list(self.aligner.map(seq1, seq2, MD=True))
        segs = {1: [h for h in hits if h.read_num == 1], 2: [h for h in hits if h.read_num == 2]}
        primary = {s: next((h for h in segs[s] if h.is_primary), None) for s in (1, 2)}
        tlen = 0
        proper = False
        if primary[1] and primary[2] and primary[1].ctg == primary[2].ctg:
            left = min(primary[1].r_st, primary[2].r_st)
            right = max(primary[1].r_en, primary[2].r_en)
            tlen = right - left
            if primary[1].r_st > primary[2].r_st:
                tlen = -tlen
            proper = True  # mappy does not expose proper_frag; same-ref pair
        rows = []
        for seg in (1, 2):
            mate = primary[2 if seg == 1 else 1]
            n_out = 0
            for hit in segs[seg]:
                if not hit.is_primary and (n_out - 1) >= self.max_secondary:
                    continue
                rows.append(
                    mappy_hit_to_row(
                        read_id, hit,
                        is_paired=True, segment_idx=seg - 1,
                        mate_mapped=mate is not None,
                        mate_rev=bool(mate and mate.strand < 0),
                        mate_ref=mate.ctg if mate else None,
                        mate_pos=(mate.r_st + 1) if mate else 0,
                        tlen=tlen if seg == 1 else -tlen,
                        proper_frag=proper,
                    )
                )
                n_out += 1
        return rows


def _mappy_backend(subjects, preset, k, w, max_secondary, eqx=True):
    return MappyBackend(
        subjects, preset=preset, k=k, w=w, max_secondary=max_secondary, eqx=eqx
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
    eqx: bool = True,
    per_subject_database: bool = False,
    backend_factory: Callable | None = None,
) -> DataFrame:
    """Align query reads against subjects; 21-column alignment output.

    Exactly one of ``subject_table`` / ``index_path`` (align_minimap2.cpp:
    32-58). ``eqx`` toggles =/X CIGAR operators (align_minimap2.cpp named
    parameter, default true; Minimap2Aligner.cpp:74-282).

    ``per_subject_database=True`` (align_minimap2.cpp:49-58,149-195)
    builds ONE INDEX PER SUBJECT and aligns every query against each
    subject's own database — primary/secondary competition happens
    within a single subject, so a query hits its best location in EVERY
    subject instead of only the globally best subject. Incompatible with
    ``index_path`` (a prebuilt index already contains all subjects).
    Spark shape: the reference iterates subjects on one thread with all
    queries in memory; here queries stay distributed (mapInPandas) and
    each task loops the per-subject backends — same output union,
    query-parallel. Each worker builds every subject's index once, so
    keep per-subject mode for the many-queries × few-small-subjects
    shape it exists for.

    Real execution needs mappy/minimap2; tests inject
    ``backend_factory`` (e.g. ExactMatchBackend)."""
    if (subject_table is None) == (index_path is None):
        raise AlignerError("Exactly one of subject_table or index_path must be provided")
    if per_subject_database and index_path is not None:
        raise AlignerError(
            "per_subject_database mode is incompatible with index_path. "
            "Pre-built indexes contain all subjects."
        )
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
        backend_factory = lambda subs: _mappy_backend(subs, preset, k, w, max_secondary, eqx)  # noqa: E731

    if subject_table is not None:
        for col in ("read_id", "sequence1"):
            if col not in subject_table.columns:
                raise AlignerError(f"subject table missing required column: {col}")
        # bind-time materialization of subjects — broadcast to every task
        # (reference sequence_table_reader.cpp:103-120). At cluster scale
        # prefer save_minimap2_index + index_path: the driver collect below
        # is bounded only by this warning.
        subjects = [
            (r["read_id"], r["sequence1"])
            for r in subject_table.select("read_id", "sequence1").collect()
        ]
        total_mb = sum(len(s or "") for _, s in subjects) / 1e6
        if total_mb > 256:
            warnings.warn(
                f"align_minimap2: collected {total_mb:.0f} MB of subject "
                "sequences to the driver for broadcast; use "
                "save_minimap2_index + index_path for large references",
                stacklevel=2,
            )
    else:
        subjects = index_path  # backend loads the prebuilt index per task

    bc = spark.sparkContext.broadcast(subjects)
    schema_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in alignments_schema().fields
    )
    paired = "sequence2" in query_table.columns
    in_cols = ["read_id", "sequence1"] + (["sequence2"] if paired else [])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if per_subject_database:
            # one single-subject backend per subject, reference subject
            # order preserved (align_minimap2.cpp:178-195 iterates
            # subjects in table order; union of rows is order-insensitive
            # but secondary caps apply per subject here exactly as there)
            backends = [backend_factory([s]) for s in bc.value]
        else:
            backends = [backend_factory(bc.value)]
        accepts_pair = paired and all(hasattr(b, "_align_paired") for b in backends)
        for pdf in batches:
            rows: list[tuple] = []
            for rec in pdf.itertuples(index=False):
                seq2 = getattr(rec, "sequence2", None) if paired else None
                for backend in backends:
                    if accepts_pair and seq2:
                        rows.extend(backend.align(rec.read_id, rec.sequence1 or "", seq2))
                    else:
                        rows.extend(backend.align(rec.read_id, rec.sequence1 or ""))
            yield pd.DataFrame(rows, columns=ALIGN_COLUMNS)

    return query_table.select(*in_cols).mapInPandas(run, schema_ddl)


def save_minimap2_index(
    spark: SparkSession,
    subject_table: DataFrame,
    output_path: str,
    preset: str = "sr",
    k: int | None = None,
    w: int | None = None,
    minimap2_path: str | None = None,
) -> DataFrame:
    """Build + persist a .mmi index from the subject table; returns the
    single-row (success, index_path, num_subjects) relation
    (save_minimap2_index.cpp:8-131).

    Runs ``minimap2 -x <preset> [-k] [-w] -d <output> <subjects.fa>`` —
    mappy has no index-dump API, so the binary is required
    (``minimap2_path`` is injectable for tests). This is the path that
    unlocks the prebuilt-index route BASELINE.md cites (10-30x bind time)."""
    for col in ("read_id", "sequence1"):
        if col not in subject_table.columns:
            raise AlignerError(f"subject table missing required column: {col}")
    exe = minimap2_path or shutil.which("minimap2")
    if exe is None:
        raise NotImplementedError(
            "save_minimap2_index requires the minimap2 binary on PATH "
            "(mappy cannot serialize indexes)"
        )
    subjects = [
        (r["read_id"], r["sequence1"])
        for r in subject_table.select("read_id", "sequence1").collect()
    ]
    if not subjects:
        raise AlignerError("Cannot build index from empty subject list")
    with tempfile.TemporaryDirectory(prefix="mm2_idx_") as td:
        fasta = os.path.join(td, "subjects.fa")
        with open(fasta, "w") as f:
            for name, seq in subjects:
                if not seq:
                    raise AlignerError(f"Cannot build index: sequence '{name}' is empty")
                f.write(f">{name}\n{seq}\n")
        cmd = [exe, "-x", preset]
        if k:
            cmd += ["-k", str(k)]
        if w:
            cmd += ["-w", str(w)]
        cmd += ["-d", output_path, fasta]
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            raise AlignerError(
                f"minimap2 index build failed (exit {proc.returncode}): {proc.stderr[:500]}"
            )
    if not os.path.exists(output_path):
        raise AlignerError(f"minimap2 reported success but wrote no index: {output_path}")
    return spark.createDataFrame(
        [(True, output_path, len(subjects))],
        "success boolean, index_path string, num_subjects bigint",
    )


def align_minimap2_sharded(
    spark: SparkSession,
    query_table: DataFrame,
    shard_directory: str,
    read_to_shard: DataFrame,
    preset: str = "sr",
    max_secondary: int = 5,
    eqx: bool = True,
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
    if backend_factory is None:
        if not mappy_available():
            raise NotImplementedError(
                "align_minimap2_sharded requires mappy/minimap2; pass backend_factory for tests"
            )
        shard_dir = shard_directory

        def backend_factory(shard_or_subjects):  # noqa: F811 - real path
            # real path: shard name routes to <shard_directory>/<shard>.mmi
            if isinstance(shard_or_subjects, str):
                return MappyBackend(
                    os.path.join(shard_dir, f"{shard_or_subjects}.mmi"),
                    preset=preset, max_secondary=max_secondary, eqx=eqx,
                )
            return MappyBackend(
                shard_or_subjects, preset=preset, max_secondary=max_secondary, eqx=eqx
            )

    routed = (
        query_table.select("read_id", "sequence1")
        .join(read_to_shard.select("read_id", "shard_name"), "read_id")
        .repartition("shard_name")
    )
    bc = spark.sparkContext.broadcast(shard_subjects)
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
                    arg = bc.value.get(shard, []) if bc.value is not None else shard
                    be = backend_factory(arg)
                    backends[shard] = be
                rows.extend(be.align(rid, seq or ""))
            yield pd.DataFrame(rows, columns=ALIGN_COLUMNS)

    out = routed.mapInPandas(run, schema_ddl)
    return out.filter((F.col("flags").bitwiseAND(4)) == 0)


# --- bowtie2 -----------------------------------------------------------------


def is_bowtie2_index_prefix(prefix: str) -> bool:
    """Bowtie2Aligner.cpp:333-364: the minimum .bt2 (or large .bt2l) file
    set that marks a valid index prefix."""
    for suffix in (".bt2", ".bt2l"):
        if all(
            os.path.exists(prefix + ext + suffix)
            for ext in (".1", ".2", ".rev.1", ".rev.2")
        ):
            return True
    return False


def parse_sam_stdout_line(line: str) -> tuple | None:
    """One bowtie2 SAM stdout line → 21-column row (None for headers),
    using the same record assembly as the SAM reader (stop_position from
    the CIGAR reference span, tag subset, '=' mate normalization)."""
    from duckdb_miint_spark.sources.sam import _finish_row, _parse_sam_tags

    if not line or line.startswith("@"):
        return None
    fields = line.rstrip("\n").split("\t")
    if len(fields) < 11:
        raise AlignerError(f"Malformed SAM record from bowtie2 ({len(fields)} fields)")
    qname, flag, rname, pos, mapq, cigar, rnext, pnext, tlen = fields[:9]
    return _finish_row(
        qname, int(flag), rname, int(pos), int(mapq), cigar, rnext,
        int(pnext), int(tlen), _parse_sam_tags(fields[11:]),
        None, None, False, None,
    )


class Bowtie2Runner:
    """Per-task bowtie2 subprocess session (Bowtie2Aligner.cpp:458-889):
    build (or load) an index in a private temp dir, start one piped
    bowtie2, feed queries on stdin from a writer thread (interleaved for
    paired reads), and parse SAM records off stdout on the calling thread —
    the two-thread split is what prevents the stdin/stdout pipe deadlock
    the reference solves with its reader thread.

    ``bowtie2_path``/``bowtie2_build_path`` are injectable so tests can
    drive the complete subprocess path with deterministic stand-in
    binaries; the defaults discover the real tools on PATH."""

    def __init__(
        self,
        preset: str | None = None,
        local: bool = False,
        threads: int = 1,
        max_secondary: int = 1,
        extra_args: str | None = None,
        quiet: bool = True,
        bowtie2_path: str | None = None,
        bowtie2_build_path: str | None = None,
    ):
        self.bowtie2 = bowtie2_path or shutil.which("bowtie2")
        self.bowtie2_build = bowtie2_build_path or shutil.which("bowtie2-build")
        if not self.bowtie2:
            raise NotImplementedError(
                "bowtie2 not found in PATH. Please install bowtie2 and ensure "
                "it is in your PATH."
            )
        self.preset = preset
        self.local = local
        self.threads = threads
        self.max_secondary = max_secondary
        self.extra_args = extra_args
        self.quiet = quiet
        self.tmpdir = tempfile.mkdtemp(prefix=f"bowtie2_{os.getpid()}_")
        self.index_prefix: str | None = None

    def build_index(self, subjects: list[tuple[str, str]]) -> None:
        if not subjects:
            raise AlignerError("Cannot build index from empty subject list")
        if not self.bowtie2_build:
            raise NotImplementedError("bowtie2-build not found in PATH")
        fasta = os.path.join(self.tmpdir, "reference.fasta")
        with open(fasta, "w") as f:
            for name, seq in subjects:
                f.write(f">{name}\n{seq}\n")
        prefix = os.path.join(self.tmpdir, "index")
        proc = subprocess.run(
            [self.bowtie2_build, "--quiet", fasta, prefix],
            capture_output=True, text=True,
        )
        if proc.returncode != 0:
            raise AlignerError(
                f"bowtie2-build failed with exit code {proc.returncode}: "
                f"{proc.stdout[:300]}{proc.stderr[:300]}"
            )
        self.index_prefix = prefix

    def load_index(self, index_prefix: str) -> None:
        if not is_bowtie2_index_prefix(index_prefix):
            raise AlignerError(
                f"No valid bowtie2 index found at prefix: {index_prefix}. "
                f"Expected files like {index_prefix}.1.bt2, "
                f"{index_prefix}.rev.1.bt2, etc."
            )
        self.index_prefix = index_prefix

    def _args(self, use_fasta: bool, is_paired: bool) -> list[str]:
        """Mirror of the reference's argv build (Bowtie2Aligner.cpp:516-584)."""
        args = [self.bowtie2, "-x", self.index_prefix]
        if use_fasta:
            args.append("-f")
        if is_paired:
            args.append("--interleaved")
        args.append("-")  # stdin
        if self.preset:
            args.append(f"--{self.preset}")
        if self.local:
            args.append("--local")
        if self.threads > 1:
            args += ["-p", str(self.threads)]
        if self.max_secondary > 0:
            args += ["-k", str(self.max_secondary)]
        if self.extra_args:
            args += self.extra_args.split()
        return args

    def align_all(self, records: list[tuple], is_paired: bool) -> list[tuple]:
        """Align (read_id, seq1[, seq2[, qual1, qual2]]) records; returns
        21-column rows. FASTQ when any record carries quality, else FASTA
        (has_quality_scores, Bowtie2Aligner.cpp:380-388)."""
        if not records:
            return []
        if self.index_prefix is None:
            raise AlignerError("No index built. Call build_index() first.")
        use_fastq = any(len(r) >= 4 and r[3] for r in records)
        proc = subprocess.Popen(
            self._args(not use_fastq, is_paired),
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL if self.quiet else None,
            text=True,
        )
        writer_err: list[Exception] = []

        def feed():
            try:
                w = proc.stdin
                for rec in records:
                    rid, s1 = rec[0], rec[1] or ""
                    s2 = rec[2] if is_paired and len(rec) > 2 else None
                    q1 = rec[3] if len(rec) > 3 else None
                    q2 = rec[4] if len(rec) > 4 else None
                    if is_paired:
                        if use_fastq:
                            w.write(f"@{rid}/1\n{s1}\n+\n{q1 or ''}\n")
                            w.write(f"@{rid}/2\n{s2 or ''}\n+\n{q2 or ''}\n")
                        else:
                            w.write(f">{rid}/1\n{s1}\n>{rid}/2\n{s2 or ''}\n")
                    else:
                        if use_fastq:
                            w.write(f"@{rid}\n{s1}\n+\n{q1 or ''}\n")
                        else:
                            w.write(f">{rid}\n{s1}\n")
                w.close()
            except (BrokenPipeError, OSError) as e:  # bowtie2 died: surface below
                writer_err.append(e)

        t = threading.Thread(target=feed, daemon=True)
        t.start()
        rows: list[tuple] = []
        for line in proc.stdout:
            row = parse_sam_stdout_line(line)
            if row is not None:
                rows.append(row)
        t.join()
        rc = proc.wait()
        if rc != 0:
            raise AlignerError(f"bowtie2 exited with code {rc}")
        if writer_err:
            raise AlignerError(f"failed writing to bowtie2 stdin: {writer_err[0]}")
        return rows

    def cleanup(self):
        shutil.rmtree(self.tmpdir, ignore_errors=True)


def _query_records(pdf: pd.DataFrame, paired: bool, with_quals: bool) -> list[tuple]:
    recs = []
    for rec in pdf.itertuples(index=False):
        q1 = getattr(rec, "qual1", None) if with_quals else None
        q2 = getattr(rec, "qual2", None) if with_quals else None
        recs.append(
            (
                rec.read_id,
                rec.sequence1 or "",
                (getattr(rec, "sequence2", None) or "") if paired else None,
                "".join(chr(min(int(v), 93) + 33) for v in q1) if q1 is not None and len(q1) else None,
                "".join(chr(min(int(v), 93) + 33) for v in q2) if q2 is not None and len(q2) else None,
            )
        )
    return recs


def align_bowtie2(
    spark: SparkSession,
    query_table: DataFrame,
    subject_table: DataFrame,
    preset: str | None = None,
    local: bool = False,
    threads: int = 1,
    max_secondary: int = 1,
    extra_args: str | None = None,
    quiet: bool = True,
    runner_factory: Callable | None = None,
) -> DataFrame:
    """Subprocess bowtie2 alignment (align_bowtie2.cpp:14-117,
    Bowtie2Aligner.cpp:26-889): subjects are materialized at plan time and
    broadcast (ReadSubjectTable at bind); each task builds its private
    index once, streams its queries to one piped bowtie2 and parses SAM
    stdout. Paired queries (sequence2 present) go down --interleaved;
    quality columns switch FASTA→FASTQ input.

    ``runner_factory() -> Bowtie2Runner`` is injectable for tests; the
    default requires the bowtie2 binaries on PATH."""
    for col in ("read_id", "sequence1"):
        if col not in query_table.columns:
            raise AlignerError(f"query table missing required column: {col}")
        if col not in subject_table.columns:
            raise AlignerError(f"subject table missing required column: {col}")
    if runner_factory is None:
        if not bowtie2_available():
            raise NotImplementedError(
                "align_bowtie2 requires the bowtie2 binary on PATH "
                "(check bowtie2_available() first)"
            )

        def runner_factory():
            return Bowtie2Runner(
                preset=preset, local=local, threads=threads,
                max_secondary=max_secondary, extra_args=extra_args, quiet=quiet,
            )

    subjects = [
        (r["read_id"], r["sequence1"])
        for r in subject_table.select("read_id", "sequence1").collect()
    ]
    bc = spark.sparkContext.broadcast(subjects)
    paired = "sequence2" in query_table.columns
    with_quals = "qual1" in query_table.columns
    in_cols = ["read_id", "sequence1"]
    if paired:
        in_cols.append("sequence2")
    if with_quals:
        in_cols.append("qual1")
        if "qual2" in query_table.columns:
            in_cols.append("qual2")
    schema_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in alignments_schema().fields
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        runner = runner_factory()
        try:
            runner.build_index(bc.value)
            for pdf in batches:
                recs = _query_records(pdf, paired, with_quals)
                rows = runner.align_all(recs, paired)
                yield pd.DataFrame(rows, columns=ALIGN_COLUMNS)
        finally:
            runner.cleanup()

    return query_table.select(*in_cols).mapInPandas(run, schema_ddl)


def align_bowtie2_sharded(
    spark: SparkSession,
    query_table: DataFrame,
    shard_directory: str,
    read_to_shard: DataFrame,
    preset: str | None = None,
    local: bool = False,
    max_secondary: int = 1,
    extra_args: str | None = None,
    quiet: bool = True,
    runner_factory: Callable | None = None,
) -> DataFrame:
    """Shard-routed bowtie2 (align_bowtie2_sharded.cpp:1-250): each shard's
    reads align against the prebuilt index at
    ``<shard_directory>/<shard>/index``. The reference's claim-a-shard
    worker loop becomes a shuffle on shard_name; one single-threaded
    bowtie2 per task (threads forced to 1, the reference's explicit
    choice — parallelism comes from shards). Unmapped reads are filtered
    (FilterMappedOnly), and index prefixes are validated at plan time
    (fail fast, BuildBowtie2ShardInfos)."""
    for col in ("read_id", "shard_name"):
        if col not in read_to_shard.columns:
            raise AlignerError(f"read_to_shard missing required column: {col}")
    for col in ("read_id", "sequence1"):
        if col not in query_table.columns:
            raise AlignerError(f"query table missing required column: {col}")
    if not os.path.isdir(shard_directory):
        raise AlignerError(f"Shard directory does not exist: {shard_directory}")
    # fail fast: every routed shard must have a valid index
    shard_names = [
        r["shard_name"]
        for r in read_to_shard.select("shard_name").distinct().collect()
    ]
    for shard in shard_names:
        prefix = os.path.join(shard_directory, shard, "index")
        if not is_bowtie2_index_prefix(prefix):
            raise AlignerError(
                f"No valid bowtie2 index found at prefix: {prefix}. Expected "
                f"files like {prefix}.1.bt2, {prefix}.rev.1.bt2, etc."
            )
    if runner_factory is None:
        if not bowtie2_available():
            raise NotImplementedError(
                "align_bowtie2_sharded requires the bowtie2 binary on PATH"
            )

        def runner_factory():
            return Bowtie2Runner(
                preset=preset, local=local, threads=1,
                max_secondary=max_secondary, extra_args=extra_args, quiet=quiet,
            )

    paired = "sequence2" in query_table.columns
    with_quals = "qual1" in query_table.columns
    in_cols = ["read_id", "sequence1"] + (["sequence2"] if paired else [])
    if with_quals:
        in_cols.append("qual1")
        if "qual2" in query_table.columns:
            in_cols.append("qual2")
    routed = (
        query_table.select(*in_cols)
        .join(read_to_shard.select("read_id", "shard_name"), "read_id")
        .repartition("shard_name")
    )
    schema_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in alignments_schema().fields
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for shard, grp in pdf.groupby("shard_name", sort=True):
                runner = runner_factory()
                try:
                    runner.load_index(os.path.join(shard_directory, str(shard), "index"))
                    recs = _query_records(grp, paired, with_quals)
                    rows = runner.align_all(recs, paired)
                finally:
                    runner.cleanup()
                yield pd.DataFrame(rows, columns=ALIGN_COLUMNS)

    out = routed.mapInPandas(run, schema_ddl)
    return out.filter((F.col("flags").bitwiseAND(4)) == 0)
