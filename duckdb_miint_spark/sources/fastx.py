"""``read_fastx``: FASTA/FASTQ reader as a Spark Python DataSource.

Parity target: reference src/read_fastx.cpp:11-271 (bind/validation/
parallelism), src/include/read_fastx.hpp:33-40 (schema), and
src/include/SequenceRecord.hpp:93-192 (read-id suffix stripping + paired-id
validation). Golden behavior: test/sql/read_fastx.test,
read_fastx_qual_offset.test, glob_read_fastx.test.

Semantics reproduced exactly:
- 7-column schema ``(sequence_index BIGINT, read_id, comment, sequence1,
  sequence2, qual1 ARRAY<INT>, qual2 ARRAY<INT>)`` + optional ``filepath``.
- Glob patterns expand and sort alphabetically; explicit lists keep order;
  ``sequence_index`` is 1-based PER FILE (pairs increment once).
- read_id = name up to first whitespace with a trailing ``/[1-9]`` stripped;
  comment = text after first whitespace, NULL when absent.
- Paired mode: R1/R2 streams read in lockstep; base-id mismatch and
  missing-mate are errors with the reference's message text; FASTA cannot
  pair with FASTQ.
- FASTA sequences strip internal whitespace; quals are NULL.
- qual_offset ∈ {33, 64}; decoded scores must be 0..93.
- gzip sniffed from magic bytes, not extension.

Scale shape: one input partition per file (pair) — identical to the
reference's file-claiming thread model (read_fastx.cpp:181-212). gzip text
is not splittable without an index, so the file is the natural unit; at
100 TB the input is many files, which is exactly what Spark schedules well.
"""

from __future__ import annotations

import glob as globmod
import gzip
import io
import json
import os
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FASTX_FIELDS = [
    StructField("sequence_index", LongType()),
    StructField("read_id", StringType()),
    StructField("comment", StringType()),
    StructField("sequence1", StringType()),
    StructField("sequence2", StringType()),
    StructField("qual1", ArrayType(IntegerType())),
    StructField("qual2", ArrayType(IntegerType())),
]


def fastx_schema(include_filepath: bool = False) -> StructType:
    fields = list(FASTX_FIELDS)
    if include_filepath:
        fields.append(StructField("filepath", StringType()))
    return StructType(fields)


# --- parsing -----------------------------------------------------------------


class FastxError(ValueError):
    pass


def base_read_id(name: str) -> str:
    """Strip a trailing ``/[1-9]`` (SequenceRecord.hpp:164-183)."""
    if len(name) >= 3 and name[-2] == "/" and "1" <= name[-1] <= "9":
        return name[:-2]
    return name


def _open_text(path: str):
    """Open possibly-gzipped text, sniffing the magic bytes like kseq."""
    raw = open(path, "rb")
    magic = raw.read(2)
    raw.seek(0)
    if magic == b"\x1f\x8b":
        return io.TextIOWrapper(gzip.GzipFile(fileobj=raw), encoding="ascii")
    return io.TextIOWrapper(raw, encoding="ascii")


def parse_fastx(path: str) -> Iterator[tuple[str, str, str, str | None]]:
    """Yield (name, comment, sequence, qual_string|None) records.

    kseq-compatible: FASTA sequences concatenate lines with whitespace
    removed; FASTQ quality spans lines until len(qual) == len(seq).
    """
    with _open_text(path) as f:
        line = f.readline()
        saw_any = False
        while line:
            line = line.rstrip("\r\n")
            if not line:
                line = f.readline()
                continue
            if line[0] not in ">@":
                raise FastxError(f"Malformed FASTX record near: {line[:50]}")
            is_fastq = line[0] == "@"
            header = line[1:]
            parts = header.split(None, 1)
            name = parts[0] if parts else ""
            comment = parts[1] if len(parts) > 1 else ""
            seq_parts: list[str] = []
            line = f.readline()
            while line and line[0] not in (">@+" if is_fastq else ">@"):
                seq_parts.append("".join(line.split()))
                line = f.readline()
            seq = "".join(seq_parts)
            qual: str | None = None
            if is_fastq:
                if not line or line[0] != "+":
                    raise FastxError(f"FASTQ record missing '+' separator: {name}")
                qual_parts: list[str] = []
                qlen = 0
                line = f.readline()
                while line and qlen < len(seq):
                    q = line.rstrip("\r\n")
                    qual_parts.append(q)
                    qlen += len(q)
                    line = f.readline()
                qual = "".join(qual_parts)
                if len(qual) != len(seq):
                    raise FastxError(
                        f"FASTQ quality length {len(qual)} != sequence length {len(seq)} for {name}"
                    )
            saw_any = True
            yield name, comment, seq, qual
        if not saw_any:
            raise FastxError("Empty file")


def decode_qual(qual: str | None, qual_offset: int) -> list[int] | None:
    """ASCII → Phred ints, range-checked 0..93 (QualScore.hpp:18-70).
    Vectorized over the record (bytes → int subtraction, one min/max check)
    — the per-char Python loop was the FASTQ scan's hot spot."""
    if qual is None:
        return None
    if not qual:
        return []
    out = [c - qual_offset for c in qual.encode("ascii")]
    lo = min(out)
    hi = max(out)
    if lo < 0 or hi > 93:
        bad = lo if lo < 0 else hi
        ch = chr(bad + qual_offset)
        raise FastxError(
            f"Invalid quality score {bad} (char {ch!r} with offset {qual_offset})"
        )
    return out


def read_fastx_file_pair(
    path1: str,
    path2: str | None,
    qual_offset: int,
    include_filepath: bool,
) -> Iterator[tuple]:
    """Rows for one file (pair), sequence_index 1-based per file."""
    it1 = parse_fastx(path1)
    it2 = parse_fastx(path2) if path2 is not None else None
    idx = 0
    while True:
        r1 = next(it1, None)
        r2 = next(it2, None) if it2 is not None else None
        if r1 is None and (it2 is None or r2 is None):
            break
        if it2 is not None:
            if r1 is None:
                raise FastxError(f"Mismatched number of records: missing mate for {r2[0]}")
            if r2 is None:
                raise FastxError(f"Mismatched number of records: missing mate for {r1[0]}")
            if (r1[3] is None) != (r2[3] is None):
                raise FastxError("Cannot mix FASTA and FASTQ formats")
            if base_read_id(r1[0]) != base_read_id(r2[0]):
                raise FastxError(f"Mismatched read IDs: {r1[0]} vs {r2[0]}")
        idx += 1
        name, comment, seq1, q1 = r1
        row = (
            idx,
            base_read_id(name),
            comment or None,
            seq1,
            r2[2] if r2 is not None else None,
            decode_qual(q1, qual_offset),
            decode_qual(r2[3], qual_offset) if r2 is not None else None,
        )
        if include_filepath:
            row = row + (path1,)
        yield row


# --- file-list resolution (bind-time) ----------------------------------------


def resolve_files(filename: str | list[str], what: str = "filename") -> list[str]:
    """Glob-expand + alphabetical sort for patterns; existence-check all
    (table_function_common.cpp:64-124)."""
    if isinstance(filename, str):
        if filename == "-":
            raise FastxError("stdin is not supported in the distributed reader")
        if any(c in filename for c in "*?["):
            files = sorted(globmod.glob(filename))
            if not files:
                raise FastxError(f"File not found: {filename}")
            return files
        files = [filename]
    else:
        files = list(filename)
        if any(f == "-" for f in files):
            raise FastxError("stdin cannot be used in a file list")
    for f in files:
        if not os.path.exists(f):
            raise FastxError(f"File not found: {f}")
    return files


# --- DataSource --------------------------------------------------------------


class FastxPartition(InputPartition):
    def __init__(self, path1: str, path2: str | None):
        self.path1 = path1
        self.path2 = path2


class FastxReader(DataSourceReader):
    def __init__(self, pairs: list[tuple[str, str | None]], qual_offset: int, include_filepath: bool):
        self.pairs = pairs
        self.qual_offset = qual_offset
        self.include_filepath = include_filepath

    def partitions(self):
        # one partition per file pair = the reference's MaxThreads model
        return [FastxPartition(p1, p2) for p1, p2 in self.pairs]

    def read(self, partition: FastxPartition):
        # Arrow-batched handoff: one buffer per DEFAULT_BATCH_ROWS rows
        # instead of a pickled tuple per record
        from duckdb_miint_spark.sources.arrow_batch import batched

        yield from batched(
            read_fastx_file_pair(
                partition.path1, partition.path2, self.qual_offset, self.include_filepath
            ),
            fastx_schema(self.include_filepath),
        )


class FastxDataSource(DataSource):
    """``spark.read.format("fastx")`` — options: path/paths(json),
    sequence2/sequence2_list(json), include_filepath, qual_offset."""

    @classmethod
    def name(cls) -> str:
        return "fastx"

    def schema(self) -> StructType:
        return fastx_schema(self.options.get("include_filepath", "false") == "true")

    def reader(self, schema: StructType) -> FastxReader:
        opts = self.options
        filename: str | list[str]
        if "paths" in opts:
            filename = json.loads(opts["paths"])
        else:
            filename = opts["path"]
        seq2: str | list[str] | None = None
        if "sequence2_list" in opts:
            seq2 = json.loads(opts["sequence2_list"])
        elif "sequence2" in opts:
            seq2 = opts["sequence2"]
        qual_offset = int(opts.get("qual_offset", "33"))
        include_filepath = opts.get("include_filepath", "false") == "true"
        pairs = plan_file_pairs(filename, seq2, qual_offset)
        return FastxReader(pairs, qual_offset, include_filepath)


def plan_file_pairs(
    filename: str | list[str], sequence2: str | list[str] | None, qual_offset: int
) -> list[tuple[str, str | None]]:
    """Bind-time validation: glob expansion, length matching, qual_offset."""
    if qual_offset not in (33, 64):
        raise FastxError("qual_offset must be 33 or 64")
    files1 = resolve_files(filename)
    if sequence2 is None:
        return [(f, None) for f in files1]
    files2 = resolve_files(sequence2, "sequence2")
    if len(files1) != len(files2):
        raise FastxError(
            f"Mismatched array lengths: {len(files1)} sequence1 files vs {len(files2)} sequence2 files"
        )
    return list(zip(files1, files2))


def read_fastx(
    spark: SparkSession,
    filename: str | list[str],
    sequence2: str | list[str] | None = None,
    include_filepath: bool = False,
    qual_offset: int = 33,
) -> DataFrame:
    """The reference's ``read_fastx(...)`` table function as a DataFrame."""
    # validate eagerly (bind-time errors, matching read_fastx.cpp:44-112)
    plan_file_pairs(filename, sequence2, qual_offset)
    spark.dataSource.register(FastxDataSource)
    reader = spark.read.format("fastx")
    if isinstance(filename, list):
        reader = reader.option("paths", json.dumps(filename))
    else:
        reader = reader.option("path", filename)
    if isinstance(sequence2, list):
        reader = reader.option("sequence2_list", json.dumps(sequence2))
    elif sequence2 is not None:
        reader = reader.option("sequence2", sequence2)
    return (
        reader.option("include_filepath", "true" if include_filepath else "false")
        .option("qual_offset", str(qual_offset))
        .load()
    )
