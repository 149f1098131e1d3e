"""Deterministic on-disk fixtures for file-format parity queries.

CSV/JSON scan operators need real files; the driver tables are parquet-only.
These fixtures are generated with plain Python (byte-deterministic, no RNG)
at import time so they exist before EITHER engine runs — the Spark query and
the DuckDB oracle then read the *same file*, making the comparison a true
differential test of the two readers.

Layout (gitignored-safe, tiny):
  tests/data/gen/annotations.tsv      tab-delimited, '#' comments, '.' nulls
  tests/data/gen/events_extra.jsonl   JSON lines with nested struct + array
  tests/data/gen/chunk_0.csv, chunk_1.csv, chunk_2.csv   glob + filename
"""

from __future__ import annotations

import json
import os

GEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "data", "gen")


def _write(path: str, content: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(content)


def ensure_fixtures() -> str:
    """Idempotently (re)write all fixtures; returns the fixture dir."""
    tsv = ["# generated annotation fixture — tab-delimited, '.' means NULL"]
    for i in range(60):
        seqid = f"chr{i % 4}"
        source = "gen"
        ftype = ("gene", "mRNA", "exon")[i % 3]
        start = 100 * i + 1
        stop = start + 50 + (i % 7) * 10
        score = "." if i % 5 == 0 else f"{(i % 9) / 2.0:.1f}"
        strand = "." if i % 11 == 0 else ("+" if i % 2 == 0 else "-")
        phase = "." if i % 3 != 0 else str(i % 3)
        attrs = f"ID=feat{i};Parent=feat{max(0, i - 1)};note=n{i % 6}"
        tsv.append(
            f"{seqid}\t{source}\t{ftype}\t{start}\t{stop}\t{score}\t{strand}\t{phase}\t{attrs}"
        )
    _write(os.path.join(GEN_DIR, "annotations.tsv"), "\n".join(tsv) + "\n")

    jl = []
    for i in range(80):
        jl.append(
            json.dumps(
                {
                    "id": i,
                    "kind": ("click", "view", "buy")[i % 3],
                    "meta": {"score": i % 10, "tag": f"t{i % 4}"},
                    "vals": [i % 5, (i * 3) % 7, (i * 7) % 11],
                },
                sort_keys=True,
            )
        )
    _write(os.path.join(GEN_DIR, "events_extra.jsonl"), "\n".join(jl) + "\n")

    for c in range(3):
        rows = ["k,v"]
        for i in range(20):
            rows.append(f"{c * 100 + i},{(c + 1) * (i + 1)}")
        _write(os.path.join(GEN_DIR, f"chunk_{c}.csv"), "\n".join(rows) + "\n")

    _write_fake_aligner_bins()
    _write_ncbi_fixtures()
    return GEN_DIR


# Recorded-response NCBI fixtures (synthetic record in the documented GBSeq
# XML / INSDC feature-table / FASTA shapes) — drive the full read_ncbi*
# operators offline through their injectable fetcher.

_NCBI_GBSEQ_XML = """<?xml version="1.0" encoding="UTF-8"?>
<GBSet>
  <GBSeq>
    <GBSeq_locus>TEST01000001</GBSeq_locus>
    <GBSeq_length>5386</GBSeq_length>
    <GBSeq_moltype>DNA</GBSeq_moltype>
    <GBSeq_update-date>15-JUN-2024</GBSeq_update-date>
    <GBSeq_definition>Synthetica exempli strain X1 chromosome, complete genome</GBSeq_definition>
    <GBSeq_primary-accession>TEST01000001</GBSeq_primary-accession>
    <GBSeq_accession-version>TEST01000001.2</GBSeq_accession-version>
    <GBSeq_organism>Synthetica exempli</GBSeq_organism>
    <GBSeq_taxonomy>Bacteria; Synthetica</GBSeq_taxonomy>
    <GBSeq_feature-table>
      <GBFeature>
        <GBFeature_key>source</GBFeature_key>
        <GBFeature_quals>
          <GBQualifier>
            <GBQualifier_name>db_xref</GBQualifier_name>
            <GBQualifier_value>taxon:1234567</GBQualifier_value>
          </GBQualifier>
        </GBFeature_quals>
      </GBFeature>
    </GBSeq_feature-table>
  </GBSeq>
</GBSet>
"""

_NCBI_FEATURE_TABLE = (
    ">Feature ref|TEST01000001.2|\n"
    "1\t5386\tsource\n"
    "\t\t\torganism\tSynthetica exempli\n"
    "1\t1320\tgene\n"
    "\t\t\tlocus_tag\tSEX_0001\n"
    "1\t1320\tCDS\n"
    "\t\t\tproduct\treplication protein\n"
    "\t\t\tcodon_start\t1\n"
    "2100\t1500\tgene\n"
    "\t\t\tlocus_tag\tSEX_0002\n"
)

_NCBI_FASTA = (
    ">TEST01000001.2 Synthetica exempli strain X1, complete genome\n"
    "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT\n"
    "GGCCTTAAGGCCTTAAGGCCTTAAGGCCTTAAGGCCTTAA\n"
)


def _write_ncbi_fixtures() -> None:
    _write(os.path.join(GEN_DIR, "ncbi_gbseq.xml"), _NCBI_GBSEQ_XML)
    _write(os.path.join(GEN_DIR, "ncbi_feature_table.txt"), _NCBI_FEATURE_TABLE)
    _write(os.path.join(GEN_DIR, "ncbi.fasta"), _NCBI_FASTA)


def ncbi_fixture_fetcher(accession: str, rettype: str) -> str:
    """Recorded-response fetcher matching the read_ncbi* fetcher contract."""
    fname = {"gb": "ncbi_gbseq.xml", "ft": "ncbi_feature_table.txt", "fasta": "ncbi.fasta"}[rettype]
    with open(os.path.join(GEN_DIR, fname)) as f:
        return f.read()


BIN_DIR = os.path.join(GEN_DIR, "bin")

# Deterministic stand-in aligner binaries. The container ships neither
# bowtie2 nor minimap2, so these drive the COMPLETE subprocess code paths
# (argv build, index build, stdin feed via writer thread, SAM-stdout parse)
# with exact-substring alignment semantics — the Spark-side machinery under
# test is identical to what the real binaries would exercise.

_FAKE_BOWTIE2_BUILD = """#!/usr/bin/env python3
\"\"\"Stand-in bowtie2-build: records the reference next to the index prefix
and creates the .bt2 marker files the prefix validation expects.\"\"\"
import shutil, sys

args = [a for a in sys.argv[1:] if a != "--quiet"]
fasta, prefix = args[0], args[1]
shutil.copyfile(fasta, prefix + ".fa")
for ext in (".1.bt2", ".2.bt2", ".3.bt2", ".4.bt2", ".rev.1.bt2", ".rev.2.bt2"):
    open(prefix + ext, "w").close()
"""

_FAKE_BOWTIE2 = """#!/usr/bin/env python3
\"\"\"Stand-in bowtie2: exact-substring alignment over the reference stored
by the stand-in bowtie2-build, speaking real bowtie2 argv + SAM stdout.
Deterministic: hits in reference insertion order then position; first hit
primary, rest flagged 0x100; -k caps reported hits; unmapped reads emit a
flag-4 record (bowtie2 default, no --no-unal).\"\"\"
import sys

args = sys.argv[1:]
prefix, k_cap, interleaved, use_fasta = None, 1, False, False
i = 0
while i < len(args):
    a = args[i]
    if a == "-x":
        prefix = args[i + 1]; i += 2
    elif a == "-k":
        k_cap = int(args[i + 1]); i += 2
    elif a == "-p":
        i += 2
    elif a == "--interleaved":
        interleaved = True; i += 1
    elif a == "-f":
        use_fasta = True; i += 1
    else:
        i += 1  # '-', --local, --<preset>, extra args: accepted, no-op

refs = []
name = None
chunks = []
for line in open(prefix + ".fa"):
    line = line.rstrip("\\n")
    if line.startswith(">"):
        if name is not None:
            refs.append((name, "".join(chunks)))
        name, chunks = line[1:].split()[0], []
    else:
        chunks.append(line)
if name is not None:
    refs.append((name, "".join(chunks)))

def read_records(stream):
    recs, lines = [], stream.read().splitlines()
    i = 0
    while i < len(lines):
        if not lines[i]:
            i += 1
            continue
        if lines[i][0] == ">":
            recs.append((lines[i][1:].split()[0], lines[i + 1], None))
            i += 2
        else:
            recs.append((lines[i][1:].split()[0], lines[i + 1], lines[i + 3]))
            i += 4
    return recs

def hits_for(seq):
    out = []
    for rname, rseq in refs:
        start = 0
        while seq:
            pos = rseq.find(seq, start)
            if pos < 0:
                break
            out.append((rname, pos + 1))
            start = pos + 1
    return out

out = sys.stdout
out.write("@HD\\tVN:1.0\\tSO:unsorted\\n")
for rname, rseq in refs:
    out.write(f"@SQ\\tSN:{rname}\\tLN:{len(rseq)}\\n")

def emit(rid, seq, qual, flags, rname, pos, mapq, extra, mate=("*", 0, 0)):
    cigar = f"{len(seq)}M" if rname != "*" else "*"
    mref, mpos, tlen = mate
    out.write(
        f"{rid}\\t{flags}\\t{rname}\\t{pos}\\t{mapq}\\t{cigar}\\t{mref}\\t{mpos}"
        f"\\t{tlen}\\t{seq}\\t{qual or '*'}" + extra + "\\n"
    )

records = read_records(sys.stdin)
if not interleaved:
    for rid, seq, qual in records:
        hs = hits_for(seq)[:k_cap]
        if not hs:
            emit(rid, seq, qual, 4, "*", 0, 0, "\\tYT:Z:UU")
            continue
        mapq = 42 if len(hs) == 1 else 1
        for n, (rname, pos) in enumerate(hs):
            flags = 0 if n == 0 else 256
            extra = f"\\tAS:i:{len(seq)}\\tNM:i:0\\tMD:Z:{len(seq)}\\tYT:Z:UU"
            emit(rid, seq, qual, flags, rname, pos, mapq, extra)
else:
    for j in range(0, len(records), 2):
        (rid1, s1, q1), (rid2, s2, q2) = records[j], records[j + 1]
        rid = rid1.rsplit("/", 1)[0]
        h1, h2 = hits_for(s1)[:1], hits_for(s2)[:1]
        proper = bool(h1 and h2 and h1[0][0] == h2[0][0])
        for seg, (seq, qual, mine, other) in enumerate(
            ((s1, q1, h1, h2), (s2, q2, h2, h1))
        ):
            flags = 1 | (64 if seg == 0 else 128)
            if not mine:
                flags |= 4
            if not other:
                flags |= 8
            if proper:
                flags |= 2
            if not mine:
                emit(rid, seq, qual, flags, "*", 0, 0, "\\tYT:Z:UP")
                continue
            rname, pos = mine[0]
            if other:
                mref = "=" if other[0][0] == rname else other[0][0]
                mpos = other[0][1]
                tl = 0
                if proper:
                    left = min(pos, mpos)
                    right = max(pos + len(seq), mpos + len(s2 if seg == 0 else s1))
                    tl = (right - left) * (1 if pos <= mpos else -1)
                mate = (mref, mpos, tl)
            else:
                mate = ("*", 0, 0)
            yt = "CP" if proper else ("DP" if other else "UP")
            extra = f"\\tAS:i:{len(seq)}\\tNM:i:0\\tMD:Z:{len(seq)}\\tYT:Z:{yt}"
            emit(rid, seq, qual, flags, rname, pos, 42, extra, mate)
"""

_FAKE_MINIMAP2 = """#!/usr/bin/env python3
\"\"\"Stand-in minimap2 (index build only): accepts the real argv shape
``minimap2 -x <preset> [-k N] [-w N] -d <out.mmi> <ref.fa>`` and writes a
deterministic marker index listing the reference names.\"\"\"
import sys

args = sys.argv[1:]
out_path, fasta = None, None
i = 0
while i < len(args):
    if args[i] == "-d":
        out_path = args[i + 1]; i += 2
    elif args[i] in ("-x", "-k", "-w"):
        i += 2
    else:
        fasta = args[i]; i += 1
names = [l[1:].split()[0] for l in open(fasta) if l.startswith(">")]
with open(out_path, "w") as f:
    f.write("FAKEMMI\\n" + "\\n".join(names) + "\\n")
"""


def _write_fake_aligner_bins() -> None:
    for fname, content in (
        ("bowtie2-build", _FAKE_BOWTIE2_BUILD),
        ("bowtie2", _FAKE_BOWTIE2),
        ("minimap2", _FAKE_MINIMAP2),
    ):
        path = os.path.join(BIN_DIR, fname)
        _write(path, content)
        os.chmod(path, 0o755)


ensure_fixtures()
