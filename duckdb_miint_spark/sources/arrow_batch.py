"""Arrow batching for the Python DataSource readers.

A Python DataSource ``read()`` may yield plain tuples (pickled row-at-a-time
— a per-row Python→JVM cost that dominates at FASTQ/SAM scale) or
``pyarrow.RecordBatch`` objects, which transfer one Arrow buffer per batch.
All the bundled readers (fastx / sam / sff) parse row-by-row in Python
either way; batching moves the handoff from O(rows) pickled tuples to
O(rows / batch_size) Arrow buffers, which is where the scan time goes once
the parser itself is warm.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructType,
)

DEFAULT_BATCH_ROWS = 4096


def _arrow_type(dt: DataType) -> pa.DataType:
    if isinstance(dt, LongType):
        return pa.int64()
    if isinstance(dt, IntegerType):
        return pa.int32()
    if isinstance(dt, StringType):
        return pa.string()
    if isinstance(dt, DoubleType):
        return pa.float64()
    if isinstance(dt, FloatType):
        return pa.float32()
    if isinstance(dt, BooleanType):
        return pa.bool_()
    if isinstance(dt, ArrayType):
        return pa.list_(_arrow_type(dt.elementType))
    raise TypeError(f"No arrow mapping for Spark type: {dt}")


def arrow_schema(schema: StructType) -> pa.Schema:
    return pa.schema([pa.field(f.name, _arrow_type(f.dataType)) for f in schema.fields])


def batched(rows: Iterator[tuple], schema: StructType, batch_rows: int = DEFAULT_BATCH_ROWS) -> Iterator[pa.RecordBatch]:
    """Pack an iterator of schema-ordered tuples into Arrow RecordBatches."""
    aschema = arrow_schema(schema)
    ncols = len(aschema)
    cols: list[list] = [[] for _ in range(ncols)]
    n = 0
    for row in rows:
        for i in range(ncols):
            cols[i].append(row[i])
        n += 1
        if n >= batch_rows:
            yield pa.RecordBatch.from_arrays(
                [pa.array(c, type=aschema.field(i).type) for i, c in enumerate(cols)],
                schema=aschema,
            )
            cols = [[] for _ in range(ncols)]
            n = 0
    if n:
        yield pa.RecordBatch.from_arrays(
            [pa.array(c, type=aschema.field(i).type) for i, c in enumerate(cols)],
            schema=aschema,
        )
