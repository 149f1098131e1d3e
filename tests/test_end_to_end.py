"""The reference's flagship user journey as one pipeline:

    read_fastx → align (deterministic backend) → SAM sink → re-read →
    woltka per-sample counts → BIOM sink → read_biom → genome_coverage

Every arrow is a real operator from this package; the only substitution
is the aligner backend (minimap2 is absent — the exact-substring backend
emits the same 21-column schema through the same plumbing).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_miint_spark.operators.aligners import ExactMatchBackend, align_minimap2
from duckdb_miint_spark.operators.coverage import genome_coverage
from duckdb_miint_spark.operators.woltka import woltka_ogu_per_sample
from duckdb_miint_spark.sinks import copy_sam
from duckdb_miint_spark.sinks.biom_sink import copy_biom
from duckdb_miint_spark.sources.biom import read_biom
from duckdb_miint_spark.sources.fastx import read_fastx
from duckdb_miint_spark.sources.sam import read_alignments

DATA = "/root/reference/data"

SUBJECTS = [
    ("contigA", "AAAATCAGATTGCAGGTTTT"),
    ("contigB", "GGGGTCAGCCTAAGTCCCCC"),
]


def test_fastq_to_biom_pipeline(spark, tmp_path):
    # 1. reads from FASTQ (reference fixtures), tagged with a sample
    reads = read_fastx(spark, f"{DATA}/fastq/small_a.fq").withColumn(
        "sample", F.lit("sampleX")
    )
    reads2 = read_fastx(spark, f"{DATA}/fastq/small_b.fq").withColumn(
        "sample", F.lit("sampleY")
    )
    all_reads = reads.unionByName(reads2)

    # 2. align against subjects (broadcast + mapInPandas plumbing)
    aligned = align_minimap2(
        spark,
        all_reads.select("read_id", "sequence1"),
        subject_table=spark.createDataFrame(SUBJECTS, ["read_id", "sequence1"]),
        backend_factory=ExactMatchBackend,
    )
    sample_map = all_reads.select("read_id", "sample")
    aligned = aligned.join(sample_map, "read_id")

    # 3. SAM round-trip (what a user would checkpoint to disk)
    sam_path = str(tmp_path / "aligned.sam")
    copy_sam(
        aligned.orderBy("read_id"),
        sam_path,
        reference_lengths=[(n, len(s)) for n, s in SUBJECTS],
    )
    back = read_alignments(spark, sam_path).join(sample_map, "read_id")
    mapped = back.filter((F.col("flags").bitwiseAND(4)) == 0)

    # 4. woltka per-sample feature counts
    counts = woltka_ogu_per_sample(mapped, "sample", "read_id")
    rows = {(r["sample_id"], r["feature_id"]): r["value"] for r in counts.collect()}
    assert rows, "expected at least one aligned read"
    assert all(v > 0 for v in rows.values())

    # 5. BIOM round-trip of the feature table
    biom_path = str(tmp_path / "counts.biom")
    copy_biom(
        counts.select(
            F.col("feature_id"), F.col("sample_id"), F.col("value")
        ),
        biom_path,
    )
    table = read_biom(spark, biom_path)
    back_rows = {(r["sample_id"], r["feature_id"]): r["value"] for r in table.collect()}
    assert back_rows == rows

    # 6. genome coverage from the same alignments
    contig_map = spark.createDataFrame(
        [("contigA", "genome1"), ("contigB", "genome1")], ["contig_id", "genome_id"]
    )
    totals = spark.createDataFrame([("genome1", 40)], ["genome_id", "total_length"])
    cov = genome_coverage(
        mapped.select("reference", "position", "stop_position"), totals, contig_map
    ).collect()
    assert len(cov) == 1
    assert 0.0 < cov[0]["proportion_covered"] <= 1.0
