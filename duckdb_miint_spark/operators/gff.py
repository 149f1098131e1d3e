"""GFF attribute parsing (reference src/include/miint_macros.hpp:102-113).

``key1=val1;key2=val2`` → map<string,string>, as a pure Catalyst expression.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_gff_attributes(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.map_from_entries(
        F.transform(
            F.split(c, ";"),
            lambda x: F.struct(
                F.split(x, "=").getItem(0).alias("key"),
                F.split(x, "=").getItem(1).alias("value"),
            ),
        )
    )
