"""Aligner tests: ExactMatchBackend plumbing, the mappy hit→row conversion
(duck-typed hits — mappy itself is environment-gated), and the complete
bowtie2 subprocess path driven end-to-end by the deterministic stand-in
binaries from fixtures (argv build, index build, stdin writer thread,
SAM-stdout parse)."""

from __future__ import annotations

import os
import subprocess

import pytest
from pyspark.sql import functions as F

from duckdb_miint_spark.fixtures import BIN_DIR
from duckdb_miint_spark.operators.aligners import (
    AlignerError,
    Bowtie2Runner,
    ExactMatchBackend,
    align_bowtie2,
    align_bowtie2_sharded,
    align_minimap2,
    align_minimap2_sharded,
    bowtie2_available,
    cigar_stats,
    mappy_hit_to_row,
    minimap2_available,
    minimap2_flags,
    save_minimap2_index,
)

# The reference's own align test fixture (test/sql/align_minimap2.test:10-22,
# align_bowtie2.test:12-24)
REF_SUBJECTS = [
    ("ref1", "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"
             "GGCCTTAAGGCCTTAAGGCCTTAAGGCCTTAAGGCCTTAAGGCCTTAAGGCC"),
    ("ref2", "TGCATGCATGCATGCATGCATGCATGCATGCATGCATGCATGCATGCATGCA"
             "AATTAATTAATTAATTAATTAATTAATTAATTAATTAATTAATTAATTAA"),
]
REF_QUERIES = [
    ("query1", "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"),
    ("query2", "TGCATGCATGCATGCATGCATGCATGCATGCATGCATGCATGCATGCATGCA"),
]


def fake_runner_factory(**kw):
    def factory():
        return Bowtie2Runner(
            bowtie2_path=os.path.join(BIN_DIR, "bowtie2"),
            bowtie2_build_path=os.path.join(BIN_DIR, "bowtie2-build"),
            **kw,
        )

    return factory

SUBJECTS = [
    ("ref1", "AAAACGTACGTTTTT"),
    ("ref2", "GGGGACGTACGTCCCC"),
]
QUERIES = [
    ("q1", "ACGTACGT"),   # hits both refs -> primary + secondary
    ("q2", "TTTTT"),      # hits ref1 only
    ("q3", "NNNNN"),      # unmapped
]


def test_align_minimap2_plumbing(spark):
    q = spark.createDataFrame(QUERIES, ["read_id", "sequence1"])
    s = spark.createDataFrame(SUBJECTS, ["read_id", "sequence1"])
    out = align_minimap2(spark, q, subject_table=s, backend_factory=ExactMatchBackend)
    rows = sorted(
        (r["read_id"], r["flags"], r["reference"], r["position"], r["stop_position"], r["cigar"])
        for r in out.collect()
    )
    assert ("q1", 0, "ref1", 4, 12, "8M") in rows
    assert ("q1", 256, "ref2", 5, 13, "8M") in rows
    assert ("q2", 0, "ref1", 11, 16, "5M") in rows
    assert ("q3", 4, "*", 0, 0, "*") in rows
    assert len(out.columns) == 21  # full alignment schema


def test_align_minimap2_validation(spark):
    q = spark.createDataFrame(QUERIES, ["read_id", "sequence1"])
    s = spark.createDataFrame(SUBJECTS, ["read_id", "sequence1"])
    with pytest.raises(AlignerError, match="Exactly one of"):
        align_minimap2(spark, q, subject_table=s, index_path="x.mmi")
    with pytest.raises(AlignerError, match="Exactly one of"):
        align_minimap2(spark, q)
    with pytest.raises(AlignerError, match="missing required column"):
        align_minimap2(spark, q.drop("sequence1"), subject_table=s)


def test_align_minimap2_per_subject_database(spark):
    """per_subject_database=True (align_minimap2.cpp:49-58,149-195): every
    query aligns against each subject's OWN single-subject index, so q1
    (which hits both refs) gets a PRIMARY hit in each — not primary +
    secondary as in combined-index mode — and the unmapped q3 reports
    once per subject database."""
    q = spark.createDataFrame(QUERIES, ["read_id", "sequence1"])
    s = spark.createDataFrame(SUBJECTS, ["read_id", "sequence1"])
    out = align_minimap2(
        spark, q, subject_table=s,
        per_subject_database=True, backend_factory=ExactMatchBackend,
    )
    rows = sorted(
        (r["read_id"], r["flags"], r["reference"], r["position"])
        for r in out.collect()
    )
    assert ("q1", 0, "ref1", 4) in rows
    assert ("q1", 0, "ref2", 5) in rows  # PRIMARY in its own database
    assert not any(f & 0x100 for _, f, _, _ in rows)  # no cross-subject secondaries
    assert rows.count(("q3", 4, "*", 0)) == 2  # unmapped once per subject DB

    # combined mode on the same input: q1's ref2 hit is a secondary
    combined = align_minimap2(spark, q, subject_table=s, backend_factory=ExactMatchBackend)
    crow = {(r["read_id"], r["reference"]): r["flags"] for r in combined.collect()}
    assert crow[("q1", "ref2")] == 0x100


def test_align_minimap2_per_subject_index_path_incompatible(spark):
    q = spark.createDataFrame(QUERIES, ["read_id", "sequence1"])
    with pytest.raises(AlignerError, match="incompatible with index_path"):
        align_minimap2(
            spark, q, index_path="x.mmi",
            per_subject_database=True, backend_factory=ExactMatchBackend,
        )


def test_mappy_backend_eqx_passthrough(monkeypatch):
    """eqx reaches mappy.Aligner's extra_flags through MappyBackend AND
    through align_minimap2's default backend factory: eqx=False must drop
    MM_F_EQX (M-op CIGARs), eqx=True (default) must set it."""
    import sys
    import types

    from duckdb_miint_spark.operators.aligners import (
        MM_F_EQX,
        MM_F_OUT_MD,
        MappyBackend,
        _mappy_backend,
    )

    captured = {}

    class FakeAligner:
        def __init__(self, fn, **kwargs):
            captured.update(kwargs)

        def __bool__(self):
            return True

        def map(self, *a, **k):
            return iter(())

    fake = types.ModuleType("mappy")
    fake.Aligner = FakeAligner
    monkeypatch.setitem(sys.modules, "mappy", fake)

    MappyBackend([("r", "ACGT")], eqx=False)
    assert not captured["extra_flags"] & MM_F_EQX
    assert captured["extra_flags"] & MM_F_OUT_MD  # MD stays on regardless

    MappyBackend([("r", "ACGT")])  # default eqx=True
    assert captured["extra_flags"] & MM_F_EQX

    # default-factory path (what align_minimap2 builds when no
    # backend_factory is injected) forwards the public kwarg
    _mappy_backend([("r", "ACGT")], "sr", None, None, 5, False)
    assert not captured["extra_flags"] & MM_F_EQX


def test_align_minimap2_sharded_routing(spark):
    q = spark.createDataFrame(QUERIES, ["read_id", "sequence1"])
    routing = spark.createDataFrame(
        [("q1", "shard_a"), ("q2", "shard_b"), ("q3", "shard_a")],
        ["read_id", "shard_name"],
    )
    shard_subjects = {
        "shard_a": [("ref2", "GGGGACGTACGTCCCC")],
        "shard_b": [("ref1", "AAAACGTACGTTTTT")],
    }
    out = align_minimap2_sharded(
        spark,
        q,
        shard_directory="/unused",
        read_to_shard=routing,
        backend_factory=ExactMatchBackend,
        shard_subjects=shard_subjects,
    )
    rows = sorted((r["read_id"], r["reference"]) for r in out.collect())
    # q1 routed to shard_a -> only ref2; q2 to shard_b -> ref1; q3 unmapped -> filtered
    assert rows == [("q1", "ref2"), ("q2", "ref1")]


def test_gated_backends(spark):
    q = spark.createDataFrame(QUERIES, ["read_id", "sequence1"])
    s = spark.createDataFrame(SUBJECTS, ["read_id", "sequence1"])
    assert isinstance(bowtie2_available(), bool)
    if not minimap2_available():
        with pytest.raises(NotImplementedError, match="minimap2"):
            align_minimap2(spark, q, subject_table=s)
    if not bowtie2_available():
        with pytest.raises(NotImplementedError, match="bowtie2"):
            align_bowtie2(spark, q, s)


# --- mappy hit -> row conversion (Minimap2Aligner.cpp reg_to_sam parity) -----


class FakeHit:
    """Duck-typed mappy.Alignment for conversion tests."""

    def __init__(self, ctg, r_st, r_en, strand=1, mapq=60, cigar_str="50=",
                 is_primary=True, NM=0, MD=None, mlen=50, read_num=1):
        self.ctg, self.r_st, self.r_en = ctg, r_st, r_en
        self.strand, self.mapq = strand, mapq
        self.cigar_str, self.is_primary = cigar_str, is_primary
        self.NM, self.MD, self.mlen, self.read_num = NM, MD, mlen, read_num


def test_cigar_stats():
    # X counts into XM+NM; each I/D run is one open + len-1 extends + len NM
    assert cigar_stats("50=") == (0, 0, 0, 0)
    assert cigar_stats("10=2X38=") == (2, 0, 0, 2)
    assert cigar_stats("10=3I40=") == (0, 1, 2, 3)
    assert cigar_stats("10=1D40=") == (0, 1, 0, 1)
    assert cigar_stats("5S10=2X1I2D30=3H") == (2, 2, 1, 5)
    assert cigar_stats("*") == (0, 0, 0, 0)


def test_minimap2_flags():
    assert minimap2_flags(1, True) == 0
    assert minimap2_flags(-1, True) == 0x10
    assert minimap2_flags(1, False) == 0x100
    # paired: first segment, mate mapped + reversed
    assert minimap2_flags(1, True, True, 0, True, True) == (0x1 | 0x40 | 0x20)
    # paired: second segment, mate unmapped
    assert minimap2_flags(1, True, True, 1, False, False) == (0x1 | 0x80 | 0x8)


def test_mappy_hit_to_row_single():
    row = dict(zip(
        [c for c in __import__("duckdb_miint_spark.operators.aligners",
                               fromlist=["ALIGN_COLUMNS"]).ALIGN_COLUMNS],
        mappy_hit_to_row("r1", FakeHit("ref1", 0, 50, MD="50", NM=0)),
    ))
    assert row["read_id"] == "r1"
    assert row["flags"] == 0
    assert row["reference"] == "ref1"
    assert row["position"] == 1  # 0-based r_st -> 1-based POS
    assert row["stop_position"] == 50  # r_en (half-open) == 1-based incl end
    assert row["cigar"] == "50="
    assert row["tag_nm"] == 0 and row["tag_xm"] == 0
    assert row["tag_as"] == 50  # mlen (documented divergence: no DP score)
    assert row["tag_xs"] == -1 and row["tag_ys"] == -1  # reference emits -1
    assert row["tag_yt"] == "UU" and row["tag_md"] == "50"
    assert row["mate_reference"] == "*" and row["template_length"] == 0


def test_mappy_hit_to_row_secondary_reverse_with_edits():
    cols = __import__("duckdb_miint_spark.operators.aligners",
                      fromlist=["ALIGN_COLUMNS"]).ALIGN_COLUMNS
    hit = FakeHit("ref2", 99, 151, strand=-1, mapq=3,
                  cigar_str="20=2X1I29=", is_primary=False, NM=3, mlen=49)
    row = dict(zip(cols, mappy_hit_to_row("r2", hit)))
    assert row["flags"] == (0x10 | 0x100)
    assert row["position"] == 100 and row["stop_position"] == 151
    assert (row["tag_xm"], row["tag_xo"], row["tag_xg"], row["tag_nm"]) == (2, 1, 0, 3)


def test_mappy_hit_to_row_paired_proper():
    cols = __import__("duckdb_miint_spark.operators.aligners",
                      fromlist=["ALIGN_COLUMNS"]).ALIGN_COLUMNS
    h1 = FakeHit("ref1", 0, 50, MD="50")
    row = dict(zip(cols, mappy_hit_to_row(
        "p1", h1, is_paired=True, segment_idx=0, mate_mapped=True,
        mate_rev=True, mate_ref="ref1", mate_pos=101, tlen=150, proper_frag=True,
    )))
    assert row["flags"] == (0x1 | 0x2 | 0x20 | 0x40)
    assert row["mate_reference"] == "="  # same-reference normalization
    assert row["mate_position"] == 101 and row["template_length"] == 150
    assert row["tag_yt"] == "CP"


# --- bowtie2: full subprocess path via the stand-in binaries -----------------


def test_bowtie2_runner_reproduces_reference_goldens(spark):
    """align_bowtie2.test:27-33,36-42,45-50,53-59 observables, through the
    REAL code path: broadcast subjects, per-task index build (subprocess),
    piped bowtie2, writer thread, SAM-stdout parse."""
    q = spark.createDataFrame(REF_QUERIES, ["read_id", "sequence1"])
    s = spark.createDataFrame(REF_SUBJECTS, ["read_id", "sequence1"])
    out = align_bowtie2(spark, q, s, runner_factory=fake_runner_factory())
    rows = {r["read_id"]: r for r in out.collect()}
    assert set(rows) == {"query1", "query2"}
    for rid, ref in (("query1", "ref1"), ("query2", "ref2")):
        r = rows[rid]
        assert r["reference"] == ref
        assert r["position"] == 1
        assert r["mapq"] >= 0
        assert r["cigar"] not in ("*", "")
        assert r["tag_as"] >= 0
        assert r["stop_position"] >= r["position"]
        assert r["tag_yt"] == "UU"


def test_bowtie2_max_secondary(spark):
    """align_bowtie2.test:92-117: -k caps reported alignments."""
    multi = spark.createDataFrame(
        [("ref1", REF_SUBJECTS[0][1]), ("ref2", REF_SUBJECTS[0][1]), ("ref3", REF_SUBJECTS[0][1])],
        ["read_id", "sequence1"],
    )
    single = spark.createDataFrame([REF_QUERIES[0]], ["read_id", "sequence1"])
    n1 = align_bowtie2(spark, single, multi,
                       runner_factory=fake_runner_factory(max_secondary=1)).count()
    assert n1 == 1
    n3 = align_bowtie2(spark, single, multi,
                       runner_factory=fake_runner_factory(max_secondary=3)).count()
    assert 1 <= n3 <= 3


def test_bowtie2_unmapped_passthrough_and_flags(spark):
    q = spark.createDataFrame(
        REF_QUERIES + [("query3", "NNNNNNNNNN")], ["read_id", "sequence1"]
    )
    s = spark.createDataFrame(REF_SUBJECTS, ["read_id", "sequence1"])
    out = align_bowtie2(spark, q, s, runner_factory=fake_runner_factory())
    rows = {r["read_id"]: r for r in out.collect()}
    # non-sharded align_bowtie2 does NOT filter unmapped (no FilterMappedOnly
    # in align_bowtie2.cpp Execute) — flag-4 record passes through
    assert rows["query3"]["flags"] == 4
    assert rows["query3"]["reference"] == "*"
    assert rows["query3"]["stop_position"] == 0


def test_bowtie2_paired_interleaved(spark):
    """Paired queries go down --interleaved with /1 /2 ids; mate fields and
    proper-pair flags come back through the SAM parse."""
    q = spark.createDataFrame(
        [("p1", REF_QUERIES[0][1], "GGCCTTAAGGCCTTAAGGCCTTAAGG")],
        ["read_id", "sequence1", "sequence2"],
    )
    s = spark.createDataFrame(REF_SUBJECTS, ["read_id", "sequence1"])
    out = align_bowtie2(spark, q, s, runner_factory=fake_runner_factory())
    rows = sorted(out.collect(), key=lambda r: r["flags"])
    assert len(rows) == 2
    first = [r for r in rows if r["flags"] & 0x40][0]
    second = [r for r in rows if r["flags"] & 0x80][0]
    assert first["flags"] & 0x1 and second["flags"] & 0x1
    assert first["flags"] & 0x2 and second["flags"] & 0x2  # same-ref proper pair
    assert first["reference"] == second["reference"] == "ref1"
    assert first["mate_reference"] == "=" and second["mate_reference"] == "="
    assert first["mate_position"] == second["position"]
    assert second["mate_position"] == first["position"]
    assert first["tag_yt"] == "CP"


def test_bowtie2_sharded_routing_and_filter(spark, tmp_path):
    """align_bowtie2_sharded.cpp: per-shard prebuilt index at
    <dir>/<shard>/index, shuffle on shard_name, unmapped filtered."""
    build = os.path.join(BIN_DIR, "bowtie2-build")
    for shard, (name, seq) in (("shard_a", REF_SUBJECTS[0]), ("shard_b", REF_SUBJECTS[1])):
        d = tmp_path / shard
        d.mkdir()
        fasta = d / "ref.fa"
        fasta.write_text(f">{name}\n{seq}\n")
        subprocess.run([build, "--quiet", str(fasta), str(d / "index")], check=True)

    q = spark.createDataFrame(
        REF_QUERIES + [("query3", "NNNNNNNNNN")], ["read_id", "sequence1"]
    )
    routing = spark.createDataFrame(
        [("query1", "shard_a"), ("query2", "shard_b"), ("query3", "shard_a")],
        ["read_id", "shard_name"],
    )
    out = align_bowtie2_sharded(
        spark, q, str(tmp_path), routing, runner_factory=fake_runner_factory()
    )
    rows = sorted((r["read_id"], r["reference"], r["position"]) for r in out.collect())
    # query3 unmapped -> filtered (FilterMappedOnly)
    assert rows == [("query1", "ref1", 1), ("query2", "ref2", 1)]


def test_bowtie2_sharded_validates_index_prefix(spark, tmp_path):
    q = spark.createDataFrame(REF_QUERIES, ["read_id", "sequence1"])
    routing = spark.createDataFrame([("query1", "missing_shard")], ["read_id", "shard_name"])
    with pytest.raises(AlignerError, match="No valid bowtie2 index"):
        align_bowtie2_sharded(
            spark, q, str(tmp_path), routing, runner_factory=fake_runner_factory()
        )


def test_save_minimap2_index_subprocess(spark, tmp_path):
    """save_minimap2_index.cpp:99-108: single-row (success, index_path,
    num_subjects) relation; index written via the minimap2 -d argv."""
    s = spark.createDataFrame(REF_SUBJECTS, ["read_id", "sequence1"])
    out_path = str(tmp_path / "ref.mmi")
    res = save_minimap2_index(
        spark, s, out_path, preset="sr",
        minimap2_path=os.path.join(BIN_DIR, "minimap2"),
    )
    row = res.collect()[0]
    assert (row["success"], row["index_path"], row["num_subjects"]) == (True, out_path, 2)
    content = open(out_path).read().splitlines()
    assert content[0] == "FAKEMMI" and content[1:] == ["ref1", "ref2"]


def test_save_minimap2_index_gated(spark):
    s = spark.createDataFrame(REF_SUBJECTS, ["read_id", "sequence1"])
    if minimap2_available():
        pytest.skip("real minimap2 present")
    with pytest.raises(NotImplementedError, match="minimap2"):
        save_minimap2_index(spark, s, "/tmp/x.mmi")
