"""Cypher-shaped pattern matching over :class:`PropertyGraph` —
chain motifs compiled to Catalyst joins (the GraphFrames technique;
PySpark has no GraphX binding, SURVEY.md §1.4).

The reference's users write Cypher patterns like::

    (l1:Link)-[:HAS_KEYWORD]->(k:Keyword)<-[:HAS_KEYWORD]-(l2:Link)

This module gives our engine the same shape::

    match(g, "(l1:Link)-[:HAS_KEYWORD]->(k:Keyword)<-[:HAS_KEYWORD]-(l2:Link)")

returning a DataFrame with one column per named pattern variable
(``l1``, ``k``, ``l2`` — the node keys), which the caller then joins
back / filters / projects with ordinary DataFrame ops (Cypher WHERE /
RETURN). Every reference query is a ≤3-hop non-recursive chain, so
chain motifs cover 100% of the surface; the compiled plan is exactly
the hand-written join tree Catalyst already optimizes (broadcast dims,
pushdown, AQE) — the DSL adds zero execution machinery, only parsing.

Grammar (regex-validated):

    pattern  := node (edge node)*
    node     := '(' var [':' Label] ')'
    edge     := '-[:REL]->'  |  '<-[:REL]-'

Labels: Link | Category | Keyword. Rels: BELONGS_TO | HAS_KEYWORD.
Repeating a variable expresses a cycle/equality constraint (standard
Cypher semantics: same var = same node), implemented as a self-join
filter.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .model import PropertyGraph

NODE_RE = re.compile(r"\(\s*(\w+)\s*(?::\s*(Link|Category|Keyword)\s*)?\)")
EDGE_RE = re.compile(r"(-|<-)\s*\[\s*:\s*(BELONGS_TO|HAS_KEYWORD)\s*\]\s*(->|-)")

# rel type -> (source label, dest label); key columns of the edge tables
REL_ENDPOINTS = {
    "BELONGS_TO": ("Link", "Category"),
    "HAS_KEYWORD": ("Link", "Keyword"),
}
NODE_KEY = {"Link": "url", "Category": "name", "Keyword": "name"}


@dataclass
class _Hop:
    src_var: str
    rel: str
    dst_var: str
    forward: bool  # True: src-[:REL]->dst in pattern order


class MotifSyntaxError(ValueError):
    pass


def _parse(pattern: str) -> tuple[list[tuple[str, str | None]], list[_Hop]]:
    pos = 0
    nodes: list[tuple[str, str | None]] = []
    hops: list[_Hop] = []
    pattern = pattern.strip()
    m = NODE_RE.match(pattern, pos)
    if not m:
        raise MotifSyntaxError(f"expected (var[:Label]) at: {pattern[pos:]!r}")
    nodes.append((m.group(1), m.group(2)))
    pos = m.end()
    while pos < len(pattern):
        em = EDGE_RE.match(pattern, pos)
        if not em:
            raise MotifSyntaxError(f"expected edge at: {pattern[pos:]!r}")
        left, rel, right = em.groups()
        if (left, right) == ("-", "->"):
            forward = True
        elif (left, right) == ("<-", "-"):
            forward = False
        else:
            raise MotifSyntaxError(f"malformed edge arrows at: {pattern[pos:]!r}")
        pos = em.end()
        nm = NODE_RE.match(pattern, pos)
        if not nm:
            raise MotifSyntaxError(f"expected (var[:Label]) at: {pattern[pos:]!r}")
        prev_var = nodes[-1][0]
        nodes.append((nm.group(1), nm.group(2)))
        pos = nm.end()
        hops.append(_Hop(prev_var, rel, nm.group(1), forward))
    return nodes, hops


def _infer_labels(
    nodes: list[tuple[str, str | None]], hops: list[_Hop]
) -> dict[str, str]:
    labels: dict[str, str] = {}
    for var, label in nodes:
        if label is not None:
            if labels.get(var, label) != label:
                raise MotifSyntaxError(f"variable {var!r} has conflicting labels")
            labels[var] = label
    for hop in hops:
        src_label, dst_label = REL_ENDPOINTS[hop.rel]
        expect = {
            hop.src_var if hop.forward else hop.dst_var: src_label,
            hop.dst_var if hop.forward else hop.src_var: dst_label,
        }
        for var, label in expect.items():
            if labels.get(var, label) != label:
                raise MotifSyntaxError(
                    f"variable {var!r}: label {labels[var]} conflicts with "
                    f"{label} required by [:{hop.rel}]"
                )
            labels[var] = label
    return labels


def match(g: PropertyGraph, pattern: str) -> DataFrame:
    """Compile a chain motif to a join tree; returns one key column per
    distinct pattern variable. Repeated edge traversals are distinct
    edge-table scans (Cypher relationship-uniqueness is per-rel-variable;
    anonymous rels here, so no uniqueness constraint — matching the
    reference's queries, which never bind rel variables)."""
    nodes, hops = _parse(pattern)
    labels = _infer_labels(nodes, hops)
    edge_tables = {"BELONGS_TO": g.belongs_to, "HAS_KEYWORD": g.has_keyword}
    node_tables = {"Link": g.links, "Category": g.categories, "Keyword": g.keywords}

    first_var = nodes[0][0]
    if first_var not in labels:
        raise MotifSyntaxError(
            f"variable {first_var!r} needs a label (no edge constrains it)"
        )
    first_label = labels[first_var]
    result = node_tables[first_label].select(
        F.col(NODE_KEY[first_label]).alias(first_var)
    )
    bound = {first_var}

    for i, hop in enumerate(hops):
        edges = edge_tables[hop.rel].select(
            F.col("src_url").alias(f"__src{i}"),
            F.col(edge_tables[hop.rel].columns[1]).alias(f"__dst{i}"),
        )
        if hop.forward:
            from_var, to_var = hop.src_var, hop.dst_var
        else:
            from_var, to_var = hop.dst_var, hop.src_var
        # from_var is the Link side (src), to_var the destination side
        anchor = hop.src_var  # already bound (chain order)
        assert anchor in bound
        anchor_edge_col = f"__src{i}" if anchor == from_var else f"__dst{i}"
        other_var = to_var if anchor == from_var else from_var
        other_edge_col = f"__dst{i}" if anchor == from_var else f"__src{i}"

        result = result.join(edges, result[anchor] == edges[anchor_edge_col])
        if other_var in bound:
            result = result.filter(F.col(other_var) == F.col(other_edge_col))
        else:
            result = result.withColumn(other_var, F.col(other_edge_col))
            bound.add(other_var)
        result = result.drop(f"__src{i}", f"__dst{i}")

    return result.select(*sorted(bound))
