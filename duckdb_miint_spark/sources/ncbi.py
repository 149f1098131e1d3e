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
    spark: SparkSession,
    accession: str | list[str],
    api_key: str | None = None,
    fetcher=None,
) -> DataFrame:
    """GenBank metadata for accession(s) (README.md:691-698 schema).

    ``fetcher(accession, rettype) -> str`` is injectable (recorded-fixture
    tests / offline gate); the default is the rate-limited live E-utilities
    client (ncbi_client.cpp:18-72)."""
    accs = [accession] if isinstance(accession, str) else list(accession)
    if not accs:
        raise NcbiError("at least one accession must be provided")
    if fetcher is None:
        limiter = RateLimiter(api_key)
        fetcher = lambda a, rettype: _fetch(a, api_key, rettype, limiter)  # noqa: E731
    rows = []
    for a in accs:
        row = parse_genbank_xml(fetcher(a, "gb"))
        if row is not None:
            rows.append(row)
    return spark.createDataFrame(rows, NCBI_SCHEMA)


def read_ncbi_fasta(
    spark: SparkSession,
    accession: str | list[str],
    api_key: str | None = None,
    include_filepath: bool = False,
    fetcher=None,
) -> DataFrame:
    """NCBI FASTA fetch → read_fastx schema (read_ncbi_fasta.cpp:1-227).
    ``fetcher`` injectable as in read_ncbi."""
    accs = [accession] if isinstance(accession, str) else list(accession)
    if not accs:
        raise NcbiError("at least one accession must be provided")
    if fetcher is None:
        limiter = RateLimiter(api_key)
        fetcher = lambda a, rettype: _fetch(a, api_key, rettype, limiter)  # noqa: E731
    rows = []
    for a in accs:
        text = fetcher(a, "fasta")
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


# --- read_ncbi_annotation ----------------------------------------------------

ANNOTATION_SCHEMA = StructType(
    [
        StructField("seqid", StringType()),
        StructField("source", StringType()),
        StructField("type", StringType()),
        StructField("position", LongType()),
        StructField("stop_position", LongType()),
        StructField("score", StringType()),
        StructField("strand", StringType()),
        StructField("phase", IntegerType()),
        StructField("attributes", StringType()),
    ]
)

_REFSEQ_PREFIXES = (
    "NC_", "NM_", "NP_", "NR_", "XM_", "XP_", "XR_", "NG_", "NT_", "NW_", "NZ_",
)


def _detect_source(seqid: str) -> str:
    if not seqid:
        return "unknown"
    if any(seqid.startswith(p) for p in _REFSEQ_PREFIXES):
        return "RefSeq"
    return "GenBank"


def _parse_simple_position(s: str) -> int:
    """Strip partial indicators (< >) and non-digit suffixes
    (ncbi_parser.cpp:364-383)."""
    if s and s[0] in "<>":
        s = s[1:]
    m = re.match(r"\d+", s)
    return int(m.group(0)) if m else 0


def parse_feature_table(text: str, warn=None) -> list[tuple]:
    """INSDC feature table → GFF-compatible rows
    (ncbi_parser.cpp:385-552): complement strand from reversed positions,
    codon_start→phase (1→0, 2→2, 3→1) for CDS, complex locations
    (join/complement/order) reduced to outer bounds with a warning.

    attributes are emitted as a ';'-joined k=v string (parse with
    parse_gff_attributes for the MAP form)."""
    rows: list[tuple] = []
    seqid = ""
    source = "unknown"
    current: dict | None = None
    warned_complex = False

    def _warn(msg: str) -> None:
        if warn:
            warn(msg)

    def _flush() -> None:
        nonlocal current
        if current is not None:
            rows.append(
                (
                    current["seqid"], current["source"], current["type"],
                    current["position"], current["stop_position"], None,
                    current["strand"],
                    current["phase"] if current["phase"] >= 0 else None,
                    ";".join(f"{k}={v}" for k, v in current["attrs"]),
                )
            )
            current = None

    for line in (text or "").splitlines():
        line = line.rstrip("\r ")
        if not line:
            continue
        if line.startswith(">"):
            if line.startswith(">Feature"):
                _flush()
                header = line[len(">Feature") + 1 :].lstrip(" \t") if len(line) > 9 else ""
                for prefix in ("ref|", "gb|", "emb|", "dbj|"):
                    if header.startswith(prefix):
                        header = header[len(prefix):]
                        bar = header.find("|")
                        if bar >= 0:
                            header = header[:bar]
                        break
                seqid = header
                source = _detect_source(seqid)
            continue
        if line.startswith("\t"):
            if current is None:
                continue
            tabs = len(line) - len(line.lstrip("\t"))
            if tabs != 3:
                _warn(f"Unexpected indentation ({tabs} tabs) in feature table, expected 3")
            qual = line[tabs:]
            key, _, value = qual.partition("\t")
            current["attrs"].append((key, value))
            if current["type"] == "CDS" and key == "codon_start":
                try:
                    cs = int(value)
                    current["phase"] = {1: 0, 2: 2, 3: 1}.get(cs, current["phase"])
                except ValueError:
                    pass
            continue
        parts = line.split()
        if len(parts) < 3:
            continue
        start_str, stop_str, ftype = parts[0], parts[1], parts[2]
        if not warned_complex and any(
            tok in s for s in (start_str, stop_str)
            for tok in ("join", "order", "complement", "..", ",")
        ):
            _warn(
                "Complex feature location detected (join/complement/order). "
                "Using outer bounds only. For full location support, use "
                "GenBank flat file format."
            )
            warned_complex = True
        _flush()
        pos1 = _parse_simple_position(start_str)
        pos2 = _parse_simple_position(stop_str)
        if pos1 > pos2:
            position, stop, strand = pos2, pos1, "-"
        else:
            position, stop, strand = pos1, pos2, "+"
        current = {
            "seqid": seqid,
            "source": source,
            "type": ftype,
            "position": position,
            "stop_position": stop,
            "strand": strand,
            "phase": 0 if ftype == "CDS" else -1,
            "attrs": [],
        }
    _flush()
    return rows


def read_ncbi_annotation(
    spark: SparkSession,
    accession: str | list[str],
    api_key: str | None = None,
    include_filepath: bool = False,
    fetcher=None,
) -> DataFrame:
    """INSDC feature table → GFF-compatible DataFrame
    (read_ncbi_annotation.cpp:1-250); network fetch driver-side.
    ``fetcher`` injectable as in read_ncbi."""
    accs = [accession] if isinstance(accession, str) else list(accession)
    if not accs:
        raise NcbiError("at least one accession must be provided")
    if fetcher is None:
        limiter = RateLimiter(api_key)
        fetcher = lambda a, rettype: _fetch(a, api_key, rettype, limiter)  # noqa: E731
    rows = []
    for a in accs:
        text = fetcher(a, "ft")
        rows.extend(parse_feature_table(text))
    return spark.createDataFrame(rows, ANNOTATION_SCHEMA)
