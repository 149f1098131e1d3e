"""``read_newick``: Newick tree file(s) → node-table DataFrame.

Parity target: reference src/read_newick.cpp:26-274 + parser
src/NewickTree.cpp:20-343. Trees are driver-small (the reference likewise
materializes all nodes before emitting); parallelism is across files only.

Node semantics (NewickTree.cpp:102-155):
- node_index = parser creation order (children created before their parent
  — post-order), root = last node, parent_index NULL for root.
- Quoted labels ('...' or "..."), '' escapes, [...] comments (nested),
  branch ``:length`` optional (missing → NULL), jplace ``{edge_id}``.
- is_tip = node has no children. Empty labels stay empty strings.
- gzip supported (magic-byte sniff); empty tree ``;`` = single unnamed root.
"""

from __future__ import annotations

import glob as globmod
import gzip
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


class NewickError(ValueError):
    pass


class _Node:
    __slots__ = ("name", "branch_length", "edge_id", "parent", "children")

    def __init__(self, name: str, branch_length: float | None, edge_id: int | None):
        self.name = name
        self.branch_length = branch_length
        self.edge_id = edge_id
        self.parent: int | None = None
        self.children: list[int] = []


class NewickParser:
    """Recursive-descent parser, a faithful port of NewickTree.cpp:20-343."""

    def __init__(self, text: str):
        self.s = text
        self.i = 0
        self.nodes: list[_Node] = []

    def peek(self) -> str:
        return self.s[self.i] if self.i < len(self.s) else "\0"

    def consume(self) -> str:
        c = self.peek()
        self.i += 1
        return c

    def skip_ws_comments(self) -> None:
        while self.i < len(self.s):
            c = self.s[self.i]
            if c.isspace():
                self.i += 1
            elif c == "[":
                start = self.i
                self.i += 1
                depth = 1
                while self.i < len(self.s) and depth > 0:
                    ch = self.s[self.i]
                    self.i += 1
                    if ch == "[":
                        depth += 1
                    elif ch == "]":
                        depth -= 1
                if depth > 0:
                    raise NewickError(f"Unclosed comment starting at position {start}")
            else:
                break

    def parse(self) -> list[_Node]:
        self.skip_ws_comments()
        if self.i >= len(self.s) or self.peek() == ";":
            if self.peek() == ";":
                self.nodes.append(_Node("", None, None))
                return self.nodes
            raise NewickError("Cannot parse empty Newick string")
        self.parse_node()
        self.skip_ws_comments()
        if self.i >= len(self.s) or self.peek() != ";":
            raise NewickError("Missing semicolon at end of Newick string")
        return self.nodes

    def parse_node(self) -> int:
        self.skip_ws_comments()
        children: list[int] = []
        if self.peek() == "(":
            self.consume()
            while True:
                self.skip_ws_comments()
                children.append(self.parse_node())
                self.skip_ws_comments()
                if self.peek() == ",":
                    self.consume()
                else:
                    break
            self.skip_ws_comments()
            if self.peek() != ")":
                raise NewickError("Unmatched opening parenthesis in Newick string")
            self.consume()
        self.skip_ws_comments()
        name = self.parse_label()
        branch_length: float | None = None
        self.skip_ws_comments()
        if self.peek() == ":":
            self.consume()
            branch_length = self.parse_branch_length()
        edge_id: int | None = None
        self.skip_ws_comments()
        if self.peek() == "{":
            edge_id = self.parse_edge_id()
        idx = len(self.nodes)
        self.nodes.append(_Node(name, branch_length, edge_id))
        for ch in children:
            self.nodes[ch].parent = idx
            self.nodes[idx].children.append(ch)
        return idx

    def parse_label(self) -> str:
        self.skip_ws_comments()
        c = self.peek()
        if c in "'\"":
            return self.parse_quoted_label(c)
        start = self.i
        while self.i < len(self.s):
            c = self.s[self.i]
            if c in "(),:;{[" or c.isspace():
                break
            self.i += 1
        return self.s[start : self.i]

    def parse_quoted_label(self, quote: str) -> str:
        self.consume()
        out: list[str] = []
        while self.i < len(self.s):
            c = self.s[self.i]
            if c == quote:
                if self.i + 1 < len(self.s) and self.s[self.i + 1] == quote:
                    out.append(quote)
                    self.i += 2
                else:
                    self.i += 1
                    return "".join(out)
            else:
                out.append(c)
                self.i += 1
        raise NewickError("Unclosed quote in Newick label")

    def parse_branch_length(self) -> float:
        while self.i < len(self.s) and self.s[self.i].isspace():
            self.i += 1
        start = self.i
        while self.i < len(self.s):
            c = self.s[self.i]
            if c in "(),;{[" or c.isspace():
                break
            self.i += 1
        tok = self.s[start : self.i]
        if not tok:
            raise NewickError("Invalid branch length: expected number after ':'")
        try:
            return float(tok)
        except ValueError:
            raise NewickError(f"Invalid branch length: '{tok}'") from None

    def parse_edge_id(self) -> int:
        self.consume()  # '{'
        while self.i < len(self.s) and self.s[self.i].isspace():
            self.i += 1
        start = self.i
        while self.i < len(self.s):
            c = self.s[self.i]
            if c in "}(),;[" or c.isspace():
                break
            self.i += 1
        tok = self.s[start : self.i]
        if not tok:
            raise NewickError("Invalid edge identifier: expected integer")
        try:
            value = int(tok)
        except ValueError:
            raise NewickError(f"Invalid edge identifier: '{tok}'") from None
        while self.i < len(self.s) and self.s[self.i].isspace():
            self.i += 1
        if self.i >= len(self.s) or self.s[self.i] != "}":
            raise NewickError("Unclosed brace in edge identifier")
        self.i += 1
        return value


def parse_newick(text: str) -> list[tuple]:
    """Newick string → [(node_index, name, branch_length, edge_id,
    parent_index, is_tip)] in creation order."""
    nodes = NewickParser(text).parse()
    return [
        (
            i,
            n.name,
            n.branch_length,
            n.edge_id,
            n.parent,
            len(n.children) == 0,
        )
        for i, n in enumerate(nodes)
    ]


NEWICK_SCHEMA = StructType(
    [
        StructField("node_index", LongType()),
        StructField("name", StringType()),
        StructField("branch_length", DoubleType()),
        StructField("edge_id", LongType()),
        StructField("parent_index", LongType()),
        StructField("is_tip", BooleanType()),
        StructField("filepath", StringType()),
    ]
)


def _read_text(path: str) -> str:
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    return data.decode()


def read_newick(spark: SparkSession, path: str | list[str], include_filepath: bool = False) -> DataFrame:
    """Newick file(s) (glob ok, gzip ok) → node table.
    ``'-'`` / ``'/dev/stdin'`` reads the driver's stdin (spooled;
    filepath reports '/dev/stdin' — read_newick_stdin.sh parity)."""
    from duckdb_miint_spark.sources.stdin_util import (
        any_stdin_in_list,
        is_stdin,
        spool_stdin,
    )

    if is_stdin(path):
        rows = [
            r + ("/dev/stdin",) for r in parse_newick(_read_text(spool_stdin(".nwk")))
        ]
        df = spark.createDataFrame(rows, NEWICK_SCHEMA)
        return df if include_filepath else df.drop("filepath")
    if any_stdin_in_list(path):
        raise NewickError("stdin cannot be used in a file list")
    if isinstance(path, str):
        paths = sorted(globmod.glob(path)) if any(c in path for c in "*?[") else [path]
    else:
        paths = list(path)
    if not paths:
        raise NewickError(f"File not found: {path}")
    for p in paths:
        if not os.path.exists(p):
            raise NewickError(f"File not found: {p}")
    rows = []
    for p in paths:
        rows.extend(r + (p,) for r in parse_newick(_read_text(p)))
    df = spark.createDataFrame(rows, NEWICK_SCHEMA)
    return df if include_filepath else df.drop("filepath")
