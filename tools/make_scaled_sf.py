"""Deterministic scale-up of the driver's sf0.1 tables (no RNG).

Spark's fixed per-query cost (~0.3-0.5 s of stage setup on local mode)
dominates the sf0.1 bench where inputs are single-digit MBs; the engine
comparison that matters at 100 TB is MARGINAL throughput. This tool
produces an sfN directory by replicating sf0.1 M times with disjoint key
spaces so both engines can run the identical headline set at a scale where
execution, not setup, is measured:

- dimension tables (region, nation) are kept as-is;
- every key/FK column is shifted by ``copy * 10**8`` — joins and group
  cardinalities scale linearly, no cross-copy collisions;
- document text gets a per-copy word prefix, so shingle/token sets are
  DISJOINT across copies: near-dup structure replicates linearly instead
  of creating an artificial 10x-duplicate corpus (which would quadratically
  favor neither engine honestly);
- embeddings replicate with shifted ids (queries filter vec_id < 5, so the
  query set stays the original five vectors).

Schemas are preserved bit-for-bit via pyarrow (the events ts column is
TIMESTAMP(MICROS) in every driver-shipped sf dir and stays micros here).
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFFSET = 10**8

KEY_COLUMNS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIM_TABLES = ["region", "nation"]


def _shift_keys(table: pa.Table, keys: list[str], copy: int) -> pa.Table:
    for k in keys:
        idx = table.schema.get_field_index(k)
        col = table.column(idx)
        shifted = pc.add(col, pa.scalar(copy * OFFSET, type=col.type))
        table = table.set_column(idx, table.schema.field(idx), shifted)
    return table


def _prefix_document_text(table: pa.Table, copy: int) -> pa.Table:
    idx = table.schema.get_field_index("text")
    prefix = f"v{copy}"
    texts = [
        " ".join(prefix + w for w in (t or "").split(" "))
        for t in table.column(idx).to_pylist()
    ]
    return table.set_column(idx, table.schema.field(idx), pa.array(texts, type=pa.string()))


def make_scaled(src_dir: str, out_dir: str, factor: int) -> None:
    """Streamed: one copy at a time through a ParquetWriter (peak memory is
    one copy, not ``factor`` of them) with bounded row groups so Spark's
    scan parallelism — row-group granularity — scales with the data."""
    os.makedirs(out_dir, exist_ok=True)
    for t in DIM_TABLES:
        src = os.path.join(src_dir, f"{t}.parquet")
        if os.path.exists(src):
            pq.write_table(pq.read_table(src), os.path.join(out_dir, f"{t}.parquet"))
    for t, keys in KEY_COLUMNS.items():
        src = os.path.join(src_dir, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        base = pq.read_table(src)
        # Row-group granularity IS Spark's scan-split granularity: a task
        # only does work if its byte range contains a row-group start, so
        # every table needs comfortably more groups than cores for native
        # (unpinned) scan parallelism — including SMALL tables with
        # CPU-heavy columns (documents: 12 MB compressed at sf2, but its
        # text scans are seconds of per-row work; one group per copy left
        # 12 of 32 cores idle). Target ~128 groups per table, capped at
        # 128k rows/group so big tables stay ~2 MB compressed per group
        # (lineitem: ~128 groups at sf2, ~470 at sf10).
        total_rows = base.num_rows * factor
        row_group_rows = max(512, min(128 * 1024, total_rows // 128))
        with pq.ParquetWriter(os.path.join(out_dir, f"{t}.parquet"), base.schema) as w:
            for i in range(factor):
                c = base if i == 0 else _shift_keys(base, keys, i)
                if t == "documents" and i > 0:
                    c = _prefix_document_text(c, i)
                w.write_table(c, row_group_size=row_group_rows)


def ensure_scaled(src_dir: str, out_dir: str, factor: int) -> str:
    """Idempotent: generate only if the output is absent or incomplete."""
    marker = os.path.join(out_dir, f".complete_x{factor}")
    if not os.path.exists(marker):
        make_scaled(src_dir, out_dir, factor)
        open(marker, "w").close()
    return out_dir


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    ensure_scaled(src, out, factor)
    print(out)
