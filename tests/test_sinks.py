"""Sink round-trips: write with our COPY sinks, read back with our readers,
compare values — mirroring test/sql/copy_fastq.test / copy_fasta.test /
copy_sam.test shapes."""

from __future__ import annotations

import gzip
import os

import pytest

from duckdb_miint_spark.sinks import copy_fasta, copy_fastq, copy_sam
from duckdb_miint_spark.sinks.fastx_sink import CopyError
from duckdb_miint_spark.sources.fastx import read_fastx
from duckdb_miint_spark.sources.sam import read_alignments

DATA = "/root/reference/data"


def fastx_rows(df):
    return sorted(tuple(r) for r in df.collect())


SINGLE_COLS = ["read_id", "comment", "sequence1", "qual1"]


def test_fastq_roundtrip_single_end(spark, tmp_path):
    src = read_fastx(spark, f"{DATA}/fastq/small_a.fq")
    out = str(tmp_path / "out.fq")
    copy_fastq(src.orderBy("sequence_index").select(*SINGLE_COLS), out)
    back = read_fastx(spark, out)
    assert fastx_rows(back) == fastx_rows(src)


def test_fastq_roundtrip_gzip_by_suffix(spark, tmp_path):
    src = read_fastx(spark, f"{DATA}/fastq/small_a.fq")
    out = str(tmp_path / "out.fq.gz")
    copy_fastq(src.orderBy("sequence_index").select(*SINGLE_COLS), out)
    with open(out, "rb") as f:
        assert f.read(2) == b"\x1f\x8b"
    assert fastx_rows(read_fastx(spark, out)) == fastx_rows(src)


def test_fastq_qual_offset_64_roundtrip(spark, tmp_path):
    src = read_fastx(spark, f"{DATA}/fastq/small_a.fq")
    out = str(tmp_path / "out64.fq")
    copy_fastq(src.select(*SINGLE_COLS), out, qual_offset=64)
    back = read_fastx(spark, out, qual_offset=64)
    assert fastx_rows(back) == fastx_rows(src)


def test_fastq_id_as_sequence_index(spark, tmp_path):
    src = read_fastx(spark, f"{DATA}/fastq/small_a.fq")
    out = str(tmp_path / "idx.fq")
    copy_fastq(src.select("sequence_index", *SINGLE_COLS), out, id_as_sequence_index=True)
    ids = sorted(r["read_id"] for r in read_fastx(spark, out).collect())
    assert ids == ["1", "2"]


def test_fastq_include_comment(spark, tmp_path):
    src = read_fastx(spark, f"{DATA}/fastq/foo.r1.fastq.gz")
    out = str(tmp_path / "c.fq")
    copy_fastq(src.select(*SINGLE_COLS), out, include_comment=True)
    back = {r["read_id"]: r["comment"] for r in read_fastx(spark, out).collect()}
    assert back == {"foo1": "comment-1", "foo2": "comment-2"}


def test_fastq_paired_interleave(spark, tmp_path):
    src = read_fastx(
        spark, f"{DATA}/fastq/small_a_r1.fq", sequence2=f"{DATA}/fastq/small_a_r2.fq"
    )
    out = str(tmp_path / "inter.fq")
    copy_fastq(src, out, interleave=True)
    back = read_fastx(spark, out)
    rows = [(r["read_id"], r["sequence1"]) for r in back.collect()]
    assert sorted(rows) == [("pair_a1", "AAAA"), ("pair_a1", "TTTT")]


def test_fastq_paired_orientation_split(spark, tmp_path):
    src = read_fastx(
        spark, f"{DATA}/fastq/small_a_r1.fq", sequence2=f"{DATA}/fastq/small_a_r2.fq"
    )
    out = str(tmp_path / "split.{ORIENTATION}.fq")
    copy_fastq(src, out, interleave=False)
    back = read_fastx(
        spark,
        str(tmp_path / "split.R1.fq"),
        sequence2=str(tmp_path / "split.R2.fq"),
    )
    assert fastx_rows(back) == fastx_rows(src)


def test_fastq_errors(spark, tmp_path):
    src = read_fastx(spark, f"{DATA}/fastq/small_a.fq")
    with pytest.raises(CopyError, match="requires 'qual1' column"):
        copy_fastq(src.drop("qual1").drop("sequence2").drop("qual2"), str(tmp_path / "e.fq"))
    paired = read_fastx(
        spark, f"{DATA}/fastq/small_a_r1.fq", sequence2=f"{DATA}/fastq/small_a_r2.fq"
    )
    with pytest.raises(CopyError, match="INTERLEAVE parameter required"):
        copy_fastq(paired, str(tmp_path / "e2.fq"))
    with pytest.raises(CopyError, match=r"\{ORIENTATION\}"):
        copy_fastq(paired, str(tmp_path / "e3.fq"), interleave=False)
    with pytest.raises(CopyError, match="QUAL_OFFSET"):
        copy_fastq(src, str(tmp_path / "e4.fq"), qual_offset=50)


def test_fasta_roundtrip(spark, tmp_path):
    src = read_fastx(spark, f"{DATA}/fastq/test.fa")
    out = str(tmp_path / "out.fa")
    copy_fasta(src.orderBy("sequence_index").select("read_id", "comment", "sequence1"), out, include_comment=True)
    back = read_fastx(spark, out)
    assert fastx_rows(back) == fastx_rows(src)


def test_fasta_distributed_dir_mode(spark, tmp_path):
    src = read_fastx(spark, f"{DATA}/fastq/test.fa")
    out = str(tmp_path / "fasta_dir")
    copy_fasta(src.select("read_id", "sequence1"), out, single_file=False)
    back = read_fastx(spark, os.path.join(out, "part-*"))
    assert sorted(r["read_id"] for r in back.collect()) == ["seq1", "seq2"]


def test_sam_roundtrip_with_header(spark, tmp_path):
    src = read_alignments(spark, f"{DATA}/sam/foo_with_tags.sam")
    out = str(tmp_path / "out.sam")
    refs = [("G1234", 1000), ("G000144735", 100000)]
    copy_sam(src.orderBy("read_id"), out, reference_lengths=refs)
    with open(out) as f:
        first = f.readline()
    assert first.startswith("@SQ\tSN:")
    back = read_alignments(spark, out)
    cols = [c for c in src.columns]
    assert sorted(map(tuple, back.select(cols).collect())) == sorted(
        map(tuple, src.select(cols).collect())
    )


def test_sam_headerless_gzip(spark, tmp_path):
    src = read_alignments(spark, f"{DATA}/sam/foo_has_header.sam")
    out = str(tmp_path / "nohdr.sam.gz")
    copy_sam(src, out, include_header=False)
    with open(out, "rb") as f:
        assert f.read(2) == b"\x1f\x8b"
    with gzip.open(out, "rt") as f:
        lines = [line.rstrip("\n") for line in f if line.strip()]
    assert len(lines) == 4 and not lines[0].startswith("@")
    # SEQ/QUAL are '*' by contract
    assert all(line.split("\t")[9] == "*" and line.split("\t")[10] == "*" for line in lines)


def test_sam_errors(spark, tmp_path):
    src = read_alignments(spark, f"{DATA}/sam/foo_has_header.sam")
    with pytest.raises(CopyError, match="requires 'flags' column"):
        copy_sam(src.drop("flags"), str(tmp_path / "e.sam"), reference_lengths=[])
    with pytest.raises(CopyError, match="REFERENCE_LENGTHS"):
        copy_sam(src, str(tmp_path / "e2.sam"))
