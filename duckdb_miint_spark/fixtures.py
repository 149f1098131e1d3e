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

    return GEN_DIR


ensure_fixtures()
