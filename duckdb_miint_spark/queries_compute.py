"""Driver-gate queries for the compute operators (SURVEY.md §2.2.2/2.2.3):
pairwise alignment, RYpe extraction/classification, aligner plumbing.

Oracles: align_pairwise and rype_classify carry the reference's own test
goldens as VALUES (test/sql/align_pairwise.test, rype_classify.test).
The minimap2-shaped plumbing query pairs the deterministic ExactMatch
backend with a DuckDB oracle that *specifies the same semantics in SQL*
(all substring occurrences, primary-first) — a true differential check of
the broadcast + mapInPandas + routing machinery. rype_extract is gated
rows-only here; its bit-exact parity against the Rust-built index is
asserted in tests/test_compute.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_miint_spark.functions.pairwise import (
    align_pairwise_cigar,
    align_pairwise_score,
)
from duckdb_miint_spark.operators.aligners import (
    Bowtie2Runner,
    EqxExactBackend,
    ExactMatchBackend,
    align_minimap2,
)
from duckdb_miint_spark.operators.rype import rype_classify, rype_extract_minimizer_set
from duckdb_miint_spark.registry import register

RYXDI = "/root/reference/data/rype/test.ryxdi"

# The reference's own aligner test fixture (test/sql/align_minimap2.test:10-22,
# align_bowtie2.test:12-24)
_REF_SUBJECTS = [
    ("ref1", "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"
             "GGCCTTAAGGCCTTAAGGCCTTAAGGCCTTAAGGCCTTAAGGCCTTAAGGCC"),
    ("ref2", "TGCATGCATGCATGCATGCATGCATGCATGCATGCATGCATGCATGCATGCA"
             "AATTAATTAATTAATTAATTAATTAATTAATTAATTAATTAATTAATTAA"),
]
_REF_QUERIES = [
    ("query1", "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"),
    ("query2", "TGCATGCATGCATGCATGCATGCATGCATGCATGCATGCATGCATGCATGCA"),
]


def _fake_bowtie2_runner(**kw):
    """Bowtie2Runner on the deterministic stand-in binaries (fixtures.BIN_DIR)
    — the complete subprocess path (index build, pipes, writer thread, SAM
    parse) with exact-substring semantics, so the gate is reproducible in a
    container without the real tool."""
    import os

    from duckdb_miint_spark.fixtures import BIN_DIR

    def factory():
        return Bowtie2Runner(
            bowtie2_path=os.path.join(BIN_DIR, "bowtie2"),
            bowtie2_build_path=os.path.join(BIN_DIR, "bowtie2-build"),
            **kw,
        )

    return factory

_PAIRS = [
    ("s1", "ACGT", "ACGT"),
    ("s2", "ACGT", "ACAT"),
    ("s3", "ACGT", ""),
    ("s4", "", "ACGT"),
    ("s5", "ACGT", "AGT"),
    ("s6", "AAAAAAAA", "AAAA"),
]

_RYPE_SEQS = [
    ("seq1", "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"),
    ("seq2", "TGCATGCATGCATGCATGCATGCATGCATGCATGCATGCATGCATGCATGCA"),
    ("seq3", "GGGGCCCCGGGGCCCCGGGGCCCCGGGGCCCCGGGGCCCCGGGGCCCCGGGG"),
]


@register(
    "align_pairwise",
    oracle="""
SELECT * FROM (VALUES
  ('s1', 0, '4='),
  ('s2', 4, '2=1X1='),
  ('s3', 14, '4I'),
  ('s4', 14, '4D'),
  ('s5', 8, '1=1I2='),
  ('s6', 14, '4I4=')
) AS t(name, score, cigar)
ORDER BY name
""",
    tags=("compute", "pairwise"),
)
def q_align_pairwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-affine pairwise score + extended CIGAR (WFA2 semantics, defaults
    4/6/2) vs align_pairwise.test goldens."""
    df = spark.createDataFrame(_PAIRS, ["name", "query", "subject"])
    r = align_pairwise_cigar("query", "subject")
    return df.select(
        "name",
        align_pairwise_score("query", "subject").alias("score"),
        r["cigar"].alias("cigar"),
    ).orderBy("name")


@register(
    "rype_classify",
    oracle="""
SELECT * FROM (VALUES
  ('seq1', 'bucket_alpha', CAST(1.0 AS DOUBLE)),
  ('seq1', 'bucket_beta', CAST(1.0 AS DOUBLE)),
  ('seq1', 'bucket_gamma', CAST(1.0 AS DOUBLE)),
  ('seq2', 'bucket_alpha', CAST(1.0 AS DOUBLE)),
  ('seq2', 'bucket_beta', CAST(1.0 AS DOUBLE)),
  ('seq2', 'bucket_gamma', CAST(1.0 AS DOUBLE)),
  ('seq3', 'bucket_alpha', CAST(1.0 AS DOUBLE)),
  ('seq3', 'bucket_gamma', CAST(1.0 AS DOUBLE))
) AS t(read_id, bucket_name, score)
ORDER BY read_id, bucket_name
""",
    tags=("compute", "rype"),
)
def q_rype_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimizer classification against the Rust-built .ryxdi parquet index
    (rype_classify.test:104-116 hit pattern; all scores 1.0)."""
    df = spark.createDataFrame(_RYPE_SEQS, ["read_id", "sequence1"])
    out = rype_classify(spark, RYXDI, df, threshold=0.05)
    return out.select("read_id", "bucket_name", "score").orderBy("read_id", "bucket_name")


@register(
    "rype_extract_sets",
    # Input is a fixed literal table (sf-independent), so the oracle is the
    # known-good output, baked as VALUES. The hash semantics behind these
    # numbers are separately bit-parity-tested against the Rust-built index
    # in tests/test_compute.py.
    oracle="""
SELECT * FROM (VALUES
  ('seq1', 1, 1, CAST(6148914691236495360 AS BIGINT)),
  ('seq2', 1, 1, CAST(6148914691236495360 AS BIGINT)),
  ('seq3', 1, 1, CAST(6148914691236506925 AS BIGINT))
) AS t(read_id, n_fwd, n_rc, min_fwd)
ORDER BY read_id
""",
    tags=("compute", "rype"),
)
def q_rype_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimizer-set extraction shape (sorted dedup per strand)."""
    df = spark.createDataFrame(_RYPE_SEQS, ["read_id", "sequence1"])
    out = rype_extract_minimizer_set(df, 16, 8)
    return out.select(
        "read_id",
        F.size("fwd_set").alias("n_fwd"),
        F.size("rc_set").alias("n_rc"),
        F.element_at("fwd_set", 1).alias("min_fwd"),
    ).orderBy("read_id")


@register(
    "align_plumbing_exact",
    oracle="""
WITH queries AS (
  SELECT * FROM (VALUES ('q1', 'ACGTACGT'), ('q2', 'TTTTT'), ('q3', 'NNNNN'))
  AS t(read_id, sequence1)
),
subjects AS (
  SELECT * FROM (VALUES (1, 'ref1', 'AAAACGTACGTTTTT'), (2, 'ref2', 'GGGGACGTACGTCCCC'))
  AS t(ord, name, seq)
),
hits AS (
  SELECT q.read_id, s.ord, s.name AS reference, gs.i AS position,
         gs.i + length(q.sequence1) AS stop_position,
         length(q.sequence1) AS qlen
  FROM queries q
  JOIN subjects s ON TRUE
  JOIN LATERAL (
    SELECT CAST(unnest(range(1, length(s.seq) + 1)) AS BIGINT) AS i
  ) gs ON substr(s.seq, CAST(gs.i AS INTEGER), length(q.sequence1)) = q.sequence1
),
ranked AS (
  SELECT read_id, reference, position, stop_position, qlen,
         ROW_NUMBER() OVER (PARTITION BY read_id ORDER BY ord, position) AS rn
  FROM hits
)
SELECT read_id,
       CASE WHEN rn = 1 THEN 0 ELSE 256 END AS flags,
       reference, position, stop_position,
       CAST(qlen AS STRING) || 'M' AS cigar
FROM ranked
UNION ALL
SELECT q.read_id, 4 AS flags, '*' AS reference, CAST(0 AS BIGINT), CAST(0 AS BIGINT), '*'
FROM queries q
WHERE NOT EXISTS (SELECT 1 FROM hits h WHERE h.read_id = q.read_id)
ORDER BY read_id, flags, reference, position
""",
    tags=("compute", "aligner"),
)
def q_align_plumbing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """align_minimap2's Spark plumbing (subject broadcast + Arrow-batched
    mapInPandas) with the deterministic exact-substring backend; the oracle
    states the identical semantics in SQL."""
    q = spark.createDataFrame(
        [("q1", "ACGTACGT"), ("q2", "TTTTT"), ("q3", "NNNNN")], ["read_id", "sequence1"]
    )
    s = spark.createDataFrame(
        [("ref1", "AAAACGTACGTTTTT"), ("ref2", "GGGGACGTACGTCCCC")], ["read_id", "sequence1"]
    )
    out = align_minimap2(spark, q, subject_table=s, backend_factory=ExactMatchBackend)
    return out.select(
        "read_id", F.col("flags").cast("int").alias("flags"), "reference",
        "position", "stop_position", "cigar",
    ).orderBy("read_id", "flags", "reference", "position")


@register(
    "align_minimap2_per_subject",
    oracle="""
WITH queries AS (
  SELECT * FROM (VALUES ('q1', 'ACGTACGT'), ('q2', 'TTTTT'), ('q4', 'ACGT'))
  AS t(read_id, sequence1)
),
subjects AS (
  SELECT * FROM (VALUES (1, 'ref1', 'AAAACGTACGTTTTT'), (2, 'ref2', 'GGGGACGTACGTCCCC'))
  AS t(ord, name, seq)
),
hits AS (
  SELECT q.read_id, s.ord, s.name AS reference, gs.i AS position,
         gs.i + length(q.sequence1) AS stop_position,
         length(q.sequence1) AS qlen
  FROM queries q
  JOIN subjects s ON TRUE
  JOIN LATERAL (
    SELECT CAST(unnest(range(1, length(s.seq) + 1)) AS BIGINT) AS i
  ) gs ON substr(s.seq, CAST(gs.i AS INTEGER), length(q.sequence1)) = q.sequence1
),
ranked AS (
  -- per-subject databases: primary/secondary ranking restarts per subject
  SELECT read_id, ord, reference, position, stop_position, qlen,
         ROW_NUMBER() OVER (PARTITION BY read_id, ord ORDER BY position) AS rn
  FROM hits
)
SELECT read_id,
       CASE WHEN rn = 1 THEN 0 ELSE 256 END AS flags,
       reference, position, stop_position,
       CAST(qlen AS STRING) || 'M' AS cigar
FROM ranked
UNION ALL
SELECT q.read_id, 4 AS flags, '*' AS reference, CAST(0 AS BIGINT), CAST(0 AS BIGINT), '*'
FROM queries q JOIN subjects s ON TRUE
WHERE NOT EXISTS (SELECT 1 FROM hits h WHERE h.read_id = q.read_id AND h.ord = s.ord)
ORDER BY read_id, flags, reference, position
""",
    tags=("compute", "aligner"),
)
def q_align_per_subject(spark: SparkSession, sf_dir: str) -> DataFrame:
    """align_minimap2(per_subject_database=True) — one index per subject
    (align_minimap2.cpp:49-58,149-195): primary/secondary competition is
    WITHIN each subject's own database, so q1 is primary in both refs
    (combined mode demotes the ref2 hit to secondary), q4's duplicate
    sites rank per subject, and an unmapped read reports once per
    subject DB. Oracle restates the semantics with a per-(read, subject)
    ROW_NUMBER."""
    q = spark.createDataFrame(
        [("q1", "ACGTACGT"), ("q2", "TTTTT"), ("q4", "ACGT")], ["read_id", "sequence1"]
    )
    s = spark.createDataFrame(
        [("ref1", "AAAACGTACGTTTTT"), ("ref2", "GGGGACGTACGTCCCC")], ["read_id", "sequence1"]
    )
    out = align_minimap2(
        spark, q, subject_table=s,
        per_subject_database=True, backend_factory=ExactMatchBackend,
    )
    return out.select(
        "read_id", F.col("flags").cast("int").alias("flags"), "reference",
        "position", "stop_position", "cigar",
    ).orderBy("read_id", "flags", "reference", "position")


@register(
    "align_sharded_routing",
    oracle="""
WITH queries AS (
  SELECT * FROM (VALUES ('q1', 'ACGTACGT'), ('q2', 'TTTTT'), ('q3', 'NNNNN'))
  AS t(read_id, sequence1)
),
routing AS (
  SELECT * FROM (VALUES ('q1', 'shard_a'), ('q2', 'shard_b'), ('q3', 'shard_a'))
  AS t(read_id, shard_name)
),
shards AS (
  SELECT * FROM (VALUES ('shard_a', 'ref2', 'GGGGACGTACGTCCCC'),
                        ('shard_b', 'ref1', 'AAAACGTACGTTTTT'))
  AS t(shard_name, ref_name, ref_seq)
),
hits AS (
  SELECT q.read_id, s.ref_name AS reference, gs.i AS position,
         gs.i + length(q.sequence1) AS stop_position
  FROM queries q
  JOIN routing r ON q.read_id = r.read_id
  JOIN shards s ON s.shard_name = r.shard_name
  JOIN LATERAL (
    SELECT CAST(unnest(range(1, length(s.ref_seq) + 1)) AS BIGINT) AS i
  ) gs ON substr(s.ref_seq, CAST(gs.i AS INTEGER), length(q.sequence1)) = q.sequence1
)
SELECT read_id, reference, position, stop_position
FROM hits
ORDER BY read_id, position
""",
    tags=("compute", "aligner"),
)
def q_align_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded-aligner routing (align_minimap2_sharded): queries join their
    shard assignment, shuffle on shard_name co-locates each shard's reads,
    unmapped filtered out — oracle states the same routing + exact-match
    semantics in SQL."""
    from duckdb_miint_spark.operators.aligners import (
        ExactMatchBackend,
        align_minimap2_sharded,
    )

    q = spark.createDataFrame(
        [("q1", "ACGTACGT"), ("q2", "TTTTT"), ("q3", "NNNNN")], ["read_id", "sequence1"]
    )
    routing = spark.createDataFrame(
        [("q1", "shard_a"), ("q2", "shard_b"), ("q3", "shard_a")],
        ["read_id", "shard_name"],
    )
    shard_subjects = {
        "shard_a": [("ref2", "GGGGACGTACGTCCCC")],
        "shard_b": [("ref1", "AAAACGTACGTTTTT")],
    }
    out = align_minimap2_sharded(
        spark, q, "/unused", routing,
        backend_factory=ExactMatchBackend, shard_subjects=shard_subjects,
    )
    return out.select("read_id", "reference", "position", "stop_position").orderBy(
        "read_id", "position"
    )


@register(
    "rype_strand_minimizers",
    # Fixed literal input → known-good output as VALUES (hash semantics
    # bit-parity-tested against the Rust index in tests/test_compute.py).
    oracle="""
SELECT * FROM (VALUES
  ('seq1', 30, 30, CAST(6148914691236495360 AS BIGINT)),
  ('seq2', 30, 30, CAST(6148914691236495360 AS BIGINT)),
  ('seq3', 30, 30, CAST(6148914691236506925 AS BIGINT))
) AS t(read_id, n_fwd, n_fwd_pos, first_hash)
ORDER BY read_id
""",
    tags=("compute", "rype"),
)
def q_rype_strand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional minimizers (duplicates kept, len(hashes)==len(positions))."""
    from duckdb_miint_spark.operators.rype import rype_extract_strand_minimizers

    df = spark.createDataFrame(_RYPE_SEQS, ["read_id", "sequence1"])
    out = rype_extract_strand_minimizers(df, 16, 8)
    return out.select(
        "read_id",
        F.size("fwd_hashes").alias("n_fwd"),
        F.size("fwd_positions").alias("n_fwd_pos"),
        F.element_at("fwd_hashes", 1).alias("first_hash"),
    ).orderBy("read_id")


# --- aligner golden gates (reference test/sql fixtures) ----------------------


@register(
    "align_minimap2_golden",
    # align_minimap2.test:24-68 observables on the reference's own fixture,
    # through the FULL align_minimap2 path (collect+broadcast subjects,
    # Arrow-batched mapInPandas) with the minimap2-faithful EqxExactBackend:
    # eqx CIGAR, r_en stop, reg_to_sam-shaped tags, no unmapped rows.
    oracle="""
SELECT * FROM (VALUES
  ('query1', 0, 'ref1', CAST(1 AS BIGINT), CAST(52 AS BIGINT), 60, '52=',
   CAST(52 AS BIGINT), CAST(0 AS BIGINT), 'UU', '52'),
  ('query2', 0, 'ref2', CAST(1 AS BIGINT), CAST(52 AS BIGINT), 60, '52=',
   CAST(52 AS BIGINT), CAST(0 AS BIGINT), 'UU', '52')
) AS t(read_id, flags, reference, position, stop_position, mapq, cigar,
       tag_as, tag_nm, tag_yt, tag_md)
ORDER BY read_id
""",
    tags=("compute", "aligner"),
)
def q_align_minimap2_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimap2 golden-path gate (Minimap2Aligner.cpp:214-263 semantics via
    the injected-but-faithful backend; real mappy backend is import-gated)."""
    q = spark.createDataFrame(_REF_QUERIES, ["read_id", "sequence1"])
    s = spark.createDataFrame(_REF_SUBJECTS, ["read_id", "sequence1"])
    out = align_minimap2(
        spark, q, subject_table=s, max_secondary=0,
        backend_factory=lambda subs: EqxExactBackend(subs, max_secondary=0),
    )
    return out.select(
        "read_id", F.col("flags").cast("int").alias("flags"), "reference",
        "position", "stop_position", "mapq", "cigar", "tag_as", "tag_nm",
        "tag_yt", "tag_md",
    ).orderBy("read_id")


@register(
    "align_bowtie2_golden",
    # align_bowtie2.test:27-59 observables through the COMPLETE subprocess
    # path: per-task bowtie2-build index, piped bowtie2 (-x/-f/-k argv),
    # writer thread, SAM-stdout parse. stop = position + CIGAR span
    # (htslib bam_endpos convention, shared with read_alignments).
    oracle="""
SELECT * FROM (VALUES
  ('query1', 0, 'ref1', CAST(1 AS BIGINT), CAST(53 AS BIGINT), 42, '52M',
   CAST(52 AS BIGINT), CAST(0 AS BIGINT), '52', 'UU'),
  ('query2', 0, 'ref2', CAST(1 AS BIGINT), CAST(53 AS BIGINT), 42, '52M',
   CAST(52 AS BIGINT), CAST(0 AS BIGINT), '52', 'UU')
) AS t(read_id, flags, reference, position, stop_position, mapq, cigar,
       tag_as, tag_nm, tag_md, tag_yt)
ORDER BY read_id
""",
    tags=("compute", "aligner", "bowtie2"),
)
def q_align_bowtie2_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bowtie2 subprocess gate (align_bowtie2.cpp:14-117,
    Bowtie2Aligner.cpp:458-889; stand-in binaries supply deterministic
    alignment, the Spark+subprocess machinery is the real path)."""
    from duckdb_miint_spark.operators.aligners import align_bowtie2

    q = spark.createDataFrame(_REF_QUERIES, ["read_id", "sequence1"])
    s = spark.createDataFrame(_REF_SUBJECTS, ["read_id", "sequence1"])
    out = align_bowtie2(spark, q, s, runner_factory=_fake_bowtie2_runner())
    return out.select(
        "read_id", F.col("flags").cast("int").alias("flags"), "reference",
        "position", "stop_position", "mapq", "cigar", "tag_as", "tag_nm",
        "tag_md", "tag_yt",
    ).orderBy("read_id")


@register(
    "align_bowtie2_sharded_golden",
    # align_bowtie2_sharded.cpp:1-250: per-shard prebuilt index at
    # <dir>/<shard>/index, routing join + shuffle on shard_name, one
    # single-threaded bowtie2 per task, unmapped filtered (FilterMappedOnly).
    oracle="""
SELECT * FROM (VALUES
  ('query1', 'ref1', CAST(1 AS BIGINT), CAST(53 AS BIGINT), '52M'),
  ('query2', 'ref2', CAST(1 AS BIGINT), CAST(53 AS BIGINT), '52M')
) AS t(read_id, reference, position, stop_position, cigar)
ORDER BY read_id
""",
    tags=("compute", "aligner", "bowtie2"),
)
def q_align_bowtie2_sharded_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded bowtie2 gate: shard indexes are (re)built driver-side with the
    stand-in bowtie2-build, then the real routed subprocess path runs."""
    import os
    import subprocess
    import tempfile

    from duckdb_miint_spark.fixtures import BIN_DIR
    from duckdb_miint_spark.operators.aligners import align_bowtie2_sharded

    shard_dir = os.path.join(tempfile.gettempdir(), "spark_graft_bt2_shards")
    build = os.path.join(BIN_DIR, "bowtie2-build")
    for shard, (name, seq) in (("shard_a", _REF_SUBJECTS[0]), ("shard_b", _REF_SUBJECTS[1])):
        d = os.path.join(shard_dir, shard)
        os.makedirs(d, exist_ok=True)
        fasta = os.path.join(d, "ref.fa")
        with open(fasta, "w") as f:
            f.write(f">{name}\n{seq}\n")
        subprocess.run([build, "--quiet", fasta, os.path.join(d, "index")], check=True)

    q = spark.createDataFrame(
        _REF_QUERIES + [("query3", "NNNNNNNNNN")], ["read_id", "sequence1"]
    )
    routing = spark.createDataFrame(
        [("query1", "shard_a"), ("query2", "shard_b"), ("query3", "shard_a")],
        ["read_id", "shard_name"],
    )
    out = align_bowtie2_sharded(
        spark, q, shard_dir, routing, runner_factory=_fake_bowtie2_runner()
    )
    return out.select(
        "read_id", "reference", "position", "stop_position", "cigar"
    ).orderBy("read_id")


@register(
    "save_minimap2_index_golden",
    # save_minimap2_index.cpp:99-108: single-row (success, index_path,
    # num_subjects) through the real subprocess argv (-x preset -d out ref.fa).
    oracle="""
SELECT true AS success,
       '/tmp/spark_graft_idx.mmi' AS index_path,
       CAST(2 AS BIGINT) AS num_subjects
""",
    tags=("compute", "aligner"),
)
def q_save_minimap2_index_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index persist gate (stand-in minimap2 binary; real one is PATH-gated)."""
    import os

    from duckdb_miint_spark.fixtures import BIN_DIR
    from duckdb_miint_spark.operators.aligners import save_minimap2_index

    s = spark.createDataFrame(_REF_SUBJECTS, ["read_id", "sequence1"])
    return save_minimap2_index(
        spark, s, "/tmp/spark_graft_idx.mmi", preset="sr",
        minimap2_path=os.path.join(BIN_DIR, "minimap2"),
    )
