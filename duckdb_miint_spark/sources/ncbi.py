"""``read_ncbi`` / ``read_ncbi_fasta``: NCBI E-utilities sources.

Parity target: reference src/read_ncbi.cpp:1-198, client
src/ncbi_client.cpp:18-72 (rate limit 3 req/s without key, 10 with;
exponential backoff on 429/500/502/503), GBSeq XML parse
src/ncbi_parser.cpp:257-318.

Network is a driver-side boundary (as in the reference — a handful of
accessions, not a data-scale fan-out). The GBSeq parser and the
DD-MON-YYYY date normalization are pure Python, tested offline against
the documented GenBank XML format; only the HTTP fetch needs the network.
"""

from __future__ import annotations

import datetime
import re
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DateType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from duckdb_miint_spark.sources.fastx import fastx_schema

EUTILS = "https://eutils.ncbi.nlm.nih.gov/entrez/eutils/efetch.fcgi"

_MONTHS = {
    "JAN": 1, "FEB": 2, "MAR": 3, "APR": 4, "MAY": 5, "JUN": 6,
    "JUL": 7, "AUG": 8, "SEP": 9, "OCT": 10, "NOV": 11, "DEC": 12,
}

NCBI_SCHEMA = StructType(
    [
        StructField("accession", StringType()),
        StructField("version", IntegerType()),
        StructField("description", StringType()),
        StructField("organism", StringType()),
        StructField("taxonomy_id", LongType()),
        StructField("length", LongType()),
        StructField("molecule_type", StringType()),
        StructField("update_date", DateType()),
    ]
)


class NcbiError(ValueError):
    pass


def _xml_value(xml: str, tag: str) -> str:
    m = re.search(rf"<{re.escape(tag)}>(.*?)</{re.escape(tag)}>", xml, re.DOTALL)
    return m.group(1).strip() if m else ""


def parse_update_date(s: str) -> datetime.date | None:
    """DD-MON-YYYY → date (ncbi_parser.cpp:289-313)."""
    m = re.fullmatch(r"(\d{1,2})-([A-Za-z]{3})-(\d{4})", s or "")
    if not m:
        return None
    day, mon, year = int(m.group(1)), _MONTHS.get(m.group(2).upper()), int(m.group(3))
    if mon is None:
        return None
    try:
        return datetime.date(year, mon, day)
    except ValueError:
        return None


def parse_genbank_xml(xml: str) -> tuple | None:
    """One GBSeq XML record → NCBI_SCHEMA row (ncbi_parser.cpp:257-318)."""
    if not xml:
        return None
    accession = _xml_value(xml, "GBSeq_accession-version") or _xml_value(
        xml, "GBSeq_primary-accession"
    )
    version = 0
    if "." in accession:
        try:
            version = int(accession.rsplit(".", 1)[1])
        except ValueError:
            version = 0
    length = 0
    ls = _xml_value(xml, "GBSeq_length")
    if ls:
        try:
            length = int(ls)
        except ValueError:
            length = 0
    tax_id = None
    tm = re.search(r"taxon:(\d+)", xml)
    if tm:
        tax_id = int(tm.group(1))
    return (
        accession,
        version,
        _xml_value(xml, "GBSeq_definition"),
        _xml_value(xml, "GBSeq_organism"),
        tax_id,
        length,
        _xml_value(xml, "GBSeq_moltype"),
        parse_update_date(_xml_value(xml, "GBSeq_update-date")),
    )


class RateLimiter:
    """3 req/s without an API key, 10 with (ncbi_client.cpp:18-37)."""

    def __init__(self, api_key: str | None):
        self.min_interval = 0.1 if api_key else 1.0 / 3.0
        self._last = 0.0

    def wait(self) -> None:
        now = time.monotonic()
        delta = now - self._last
        if delta < self.min_interval:
            time.sleep(self.min_interval - delta)
        self._last = time.monotonic()


def _fetch(accession: str, api_key: str | None, rettype: str, limiter: RateLimiter) -> str:
    import requests

    params = {"db": "nuccore", "id": accession, "rettype": rettype, "retmode": "xml" if rettype == "gb" else "text"}
    if api_key:
        params["api_key"] = api_key
    backoff = 1.0
    for _attempt in range(5):
        limiter.wait()
        resp = requests.get(EUTILS, params=params, timeout=30)
        if resp.status_code in (429, 500, 502, 503):
            time.sleep(backoff)
            backoff *= 2
            continue
        resp.raise_for_status()
        return resp.text
    raise NcbiError(f"NCBI fetch failed after retries: {accession}")


def read_ncbi(
    spark: SparkSession, accession: str | list[str], api_key: str | None = None
) -> DataFrame:
    """GenBank metadata for accession(s) (README.md:691-698 schema)."""
    accs = [accession] if isinstance(accession, str) else list(accession)
    if not accs:
        raise NcbiError("at least one accession must be provided")
    limiter = RateLimiter(api_key)
    rows = []
    for a in accs:
        row = parse_genbank_xml(_fetch(a, api_key, "gb", limiter))
        if row is not None:
            rows.append(row)
    return spark.createDataFrame(rows, NCBI_SCHEMA)


def read_ncbi_fasta(
    spark: SparkSession,
    accession: str | list[str],
    api_key: str | None = None,
    include_filepath: bool = False,
) -> DataFrame:
    """NCBI FASTA fetch → read_fastx schema (read_ncbi_fasta.cpp:1-227)."""
    accs = [accession] if isinstance(accession, str) else list(accession)
    if not accs:
        raise NcbiError("at least one accession must be provided")
    limiter = RateLimiter(api_key)
    rows = []
    for a in accs:
        text = _fetch(a, api_key, "fasta", limiter)
        idx = 0
        name, comment, seq_parts = None, "", []
        for line in text.splitlines() + [">"]:
            if line.startswith(">"):
                if name is not None:
                    idx += 1
                    row = (idx, name, comment or None, "".join(seq_parts), None, None, None)
                    if include_filepath:
                        row = row + (f"{EUTILS}?id={a}",)
                    rows.append(row)
                header = line[1:]
                parts = header.split(None, 1)
                name = parts[0] if parts else None
                comment = parts[1] if len(parts) > 1 else ""
                seq_parts = []
            else:
                seq_parts.append(line.strip())
    return spark.createDataFrame(rows, fastx_schema(include_filepath))
