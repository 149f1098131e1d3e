"""NEWICK COPY sink: node table → Newick file, with jplace placement
insertion.

Parity target: reference src/copy_newick.cpp:94-386 and
src/NewickTree.cpp:550-926 — tree build with the full validation taxonomy
(duplicate ids, missing/multiple roots, dangling parents, cycles,
disconnected nodes), ``%.15g`` branch lengths, quote-if-special labels
with ``''`` escapes, ``{edge}`` suffixes, and fully-resolved placement
insertion (dedupe by fragment keeping max like_weight_ratio then min
pendant_length with 1e-9 epsilon; per-edge chains sorted by distal_length
descending).

Trees are driver-sized by contract (the reference likewise accumulates all
rows, then builds/validates in Finalize — a blocking single-writer sink);
the collect here is the same design point, documented as such.
"""

from __future__ import annotations

import gzip
import math

from pyspark.sql import DataFrame


class NewickBuildError(ValueError):
    pass


class _TNode:
    __slots__ = ("name", "branch_length", "edge_id", "parent", "children")

    def __init__(self, name, branch_length, edge_id):
        self.name = name or ""
        self.branch_length = branch_length
        self.edge_id = edge_id
        self.parent: int | None = None
        self.children: list[int] = []


class NewickTreeBuilder:
    """Port of NewickTree::build + insert_fully_resolved + to_newick."""

    def __init__(self):
        self.nodes: list[_TNode] = []
        self.root: int | None = None

    @classmethod
    def build(cls, rows: list[tuple]) -> "NewickTreeBuilder":
        """rows: (node_id, name, branch_length, edge_id, parent_id)."""
        if not rows:
            raise NewickBuildError("Cannot build tree from empty node list")
        t = cls()
        id_to_idx: dict[int, int] = {}
        for i, (node_id, *_rest) in enumerate(rows):
            if node_id in id_to_idx:
                raise NewickBuildError(f"Duplicate node_id: {node_id}")
            id_to_idx[node_id] = i
        roots = []
        for i, (node_id, name, bl, eid, parent_id) in enumerate(rows):
            if parent_id is None:
                roots.append(i)
            elif parent_id not in id_to_idx:
                raise NewickBuildError(
                    f"Node {node_id} references non-existent parent {parent_id}"
                )
        if not roots:
            raise NewickBuildError("No root found (no node with null parent_id)")
        if len(roots) > 1:
            raise NewickBuildError(
                f"Multiple roots found ({len(roots)} nodes with null parent_id)"
            )
        for node_id, name, bl, eid, parent_id in rows:
            t.nodes.append(_TNode(name, bl, eid))
        for i, (node_id, name, bl, eid, parent_id) in enumerate(rows):
            if parent_id is None:
                t.root = i
            else:
                p = id_to_idx[parent_id]
                t.nodes[i].parent = p
                t.nodes[p].children.append(i)
        # cycle/reachability check (DFS from root)
        visited = [False] * len(t.nodes)
        stack = [t.root]
        visited[t.root] = True
        while stack:
            cur = stack.pop()
            for ch in t.nodes[cur].children:
                if visited[ch]:
                    raise NewickBuildError(f"Cycle detected involving node {rows[ch][0]}")
                visited[ch] = True
                stack.append(ch)
        for i, v in enumerate(visited):
            if not v:
                raise NewickBuildError(
                    f"Node {rows[i][0]} is not reachable from root (disconnected tree)"
                )
        return t

    # --- placements ----------------------------------------------------------

    def insert_fully_resolved(self, placements: list[tuple]) -> None:
        """placements: (fragment_id, edge_id, like_weight_ratio,
        distal_length, pendant_length) — NewickTree.cpp:789-926."""
        if not placements:
            return
        edge_index = {
            n.edge_id: i for i, n in enumerate(self.nodes) if n.edge_id is not None
        }
        for frag, edge_id, lwr, distal, pendant in placements:
            if edge_id not in edge_index:
                raise NewickBuildError(f"Unknown edge_id {edge_id} for fragment '{frag}'")
            if distal < 0:
                raise NewickBuildError(
                    f"Negative distal_length {distal:.6f} for fragment '{frag}'"
                )
            if pendant < 0:
                raise NewickBuildError(
                    f"Negative pendant_length {pendant:.6f} for fragment '{frag}'"
                )
            el = self.nodes[edge_index[edge_id]].branch_length
            if el is not None and not math.isnan(el) and distal > el:
                raise NewickBuildError(
                    f"distal_length {distal:.6f} exceeds edge length {el:.6f} "
                    f"for fragment '{frag}'"
                )
        # dedupe: max like_weight_ratio, epsilon 1e-9, tie → min pendant_length
        eps = 1e-9
        best: dict[str, tuple] = {}
        for p in placements:
            frag = p[0]
            cur = best.get(frag)
            if cur is None:
                best[frag] = p
            else:
                diff = p[2] - cur[2]
                if diff > eps or (abs(diff) <= eps and p[4] < cur[4]):
                    best[frag] = p
        by_edge: dict[int, list[tuple]] = {}
        for p in best.values():
            by_edge.setdefault(p[1], []).append(p)
        for edge_id, plist in by_edge.items():
            plist.sort(key=lambda p: -p[3])  # distal_length descending
            edge_node = edge_index[edge_id]
            original_parent = self.nodes[edge_node].parent
            if original_parent is not None:
                self.nodes[original_parent].children.remove(edge_node)
                self.nodes[edge_node].parent = None
            remaining = self.nodes[edge_node].branch_length
            current_parent = original_parent
            for frag, _eid, _lwr, distal, pendant in plist:
                if remaining is None or math.isnan(remaining):
                    internal_bl = float("nan")
                else:
                    internal_bl = remaining - distal
                new_internal = len(self.nodes)
                self.nodes.append(_TNode("", internal_bl, None))
                fragment_node = len(self.nodes)
                self.nodes.append(_TNode(frag, pendant, None))
                if current_parent is not None:
                    self.nodes[new_internal].parent = current_parent
                    self.nodes[current_parent].children.append(new_internal)
                else:
                    self.root = new_internal
                self.nodes[fragment_node].parent = new_internal
                self.nodes[new_internal].children.append(fragment_node)
                current_parent = new_internal
                remaining = distal
            self.nodes[edge_node].branch_length = remaining
            self.nodes[edge_node].parent = current_parent
            self.nodes[current_parent].children.append(edge_node)

    # --- serialization -------------------------------------------------------

    _SPECIAL = set("(),:;{}'\"[] \t\n\r")

    def _label(self, name: str) -> str:
        if not name:
            return ""
        if any(c in self._SPECIAL or c.isspace() for c in name):
            return "'" + name.replace("'", "''") + "'"
        return name

    def to_newick(self, edge_ids: bool = True) -> str:
        if not self.nodes:
            return ";"
        out: list[str] = []

        def serialize(idx: int) -> None:
            n = self.nodes[idx]
            if n.children:
                out.append("(")
                for ci, ch in enumerate(n.children):
                    if ci > 0:
                        out.append(",")
                    serialize(ch)
                out.append(")")
            out.append(self._label(n.name))
            if n.branch_length is not None and not math.isnan(n.branch_length):
                out.append(":" + ("%.15g" % n.branch_length))
            if edge_ids and n.edge_id is not None:
                out.append("{%d}" % n.edge_id)

        import sys

        old_limit = sys.getrecursionlimit()
        sys.setrecursionlimit(max(old_limit, len(self.nodes) * 2 + 100))
        try:
            serialize(self.root)
        finally:
            sys.setrecursionlimit(old_limit)
        out.append(";")
        return "".join(out)


def copy_newick(
    df: DataFrame,
    path: str,
    edge_ids: bool | None = None,
    placements: DataFrame | None = None,
    compression: str | None = None,
) -> None:
    """COPY (df) TO path (FORMAT NEWICK, ...) — requires node_index and
    parent_index columns (+ optional name, branch_length, edge_id).

    EDGE_IDS default: true iff the input carries an edge_id column
    (copy_newick.cpp option handling). PLACEMENTS: a relation with
    (fragment_id, edge_id, like_weight_ratio, distal_length,
    pendant_length) inserted fully-resolved before serialization.
    """
    cols = df.columns
    for c in ("node_index", "parent_index"):
        if c not in cols:
            raise NewickBuildError(f"COPY FORMAT NEWICK requires '{c}' column")
    has_edge = "edge_id" in cols
    if edge_ids is None:
        edge_ids = has_edge
    rows = [
        (
            r["node_index"],
            r["name"] if "name" in cols else "",
            r["branch_length"] if "branch_length" in cols else None,
            r["edge_id"] if has_edge else None,
            r["parent_index"],
        )
        for r in df.collect()
    ]
    tree = NewickTreeBuilder.build(rows)
    if placements is not None:
        pl = [
            (
                r["fragment_id"],
                r["edge_id"],
                float(r["like_weight_ratio"]),
                float(r["distal_length"]),
                float(r["pendant_length"]),
            )
            for r in placements.collect()
        ]
        tree.insert_fully_resolved(pl)
    text = tree.to_newick(edge_ids=edge_ids) + "\n"
    use_gzip = compression == "gzip" or (compression is None and path.endswith(".gz"))
    opener = gzip.open if use_gzip else open
    with opener(path, "wt") as f:
        f.write(text)
