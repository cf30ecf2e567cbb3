"""Cypher front end for :class:`PropertyGraph` — the reference's query
language, compiled to Catalyst join trees.

The reference's entire application surface is Cypher strings against
embedded Kùzu (``dockerapp/app/main.py:25-490``). :mod:`.motif` already
gives the *pattern* shape; this module adds the full read-statement
grammar those strings use — multi-pattern MATCH with inline property
maps, ``$param`` substitution, WHERE, RETURN (projections, aliases,
DISTINCT, COUNT), ORDER BY, LIMIT — plus the three write shapes (MERGE
node, MATCH+MERGE relationship, MATCH+DETACH DELETE), so a reference
user can paste their queries unchanged:

    cypher(g, "MATCH (l:Link {url: $url}) RETURN l.url", {"url": u})
    cypher_write(store, "MERGE (:Category {name: $name})", {"name": n})

Scope (everything the reference executes, verified against every
``conn.execute`` call in ``main.py``): non-recursive chain patterns over
Link/Category/Keyword with BELONGS_TO/HAS_KEYWORD, boolean WHERE
(AND/OR/NOT with parentheses; AND binds tighter) over
``=``/``<>``/``<``/``>``/``<=``/``>=``/``IS [NOT] NULL``/
``CONTAINS``/``STARTS WITH``/``ENDS WITH``,
property-map equality, parameters, implicit-grouping COUNT, and the
bounded variable-length reach shape
``MATCH (n)-[*1..h]-(m) RETURN n, COUNT(DISTINCT m)`` (compiled to
``algorithms.bounded_reach``; unbounded ``*`` refuses). Not a full
openCypher engine: no path projection from var-length matches, no
expressions in RETURN beyond properties and COUNT.

Execution model: ZERO new machinery — patterns compile to the same
equi-join trees :mod:`.motif` builds (Catalyst broadcasts the Category/
Keyword dims, pushes predicates into scans), property access joins the
node table on its key, WHERE/RETURN become ``filter``/``select``/
``groupBy``. The translator is parse-time only; at 100 TB the plan is
byte-identical to the hand-written DataFrame version (test-pinned).

Output column names follow Kùzu: ``l.url`` stays ``l.url`` unless
``AS`` renames it.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .model import PropertyGraph
from .motif import NODE_KEY, REL_ENDPOINTS, MotifSyntaxError


class CypherSyntaxError(MotifSyntaxError):
    pass


class CypherUnboundAnchorError(CypherSyntaxError):
    """A MATCH with multiple comma-separated chains where a later
    chain's anchor shares no variable with earlier chains and carries no
    binding (inline property map or WHERE equality). Correct Cypher
    semantics would cross-join the full anchor table into the frame —
    |table|² intermediate work before any cap — and the reference never
    issues such a pattern (``main.py:136-139`` binds both sides with
    property maps), so the translator refuses instead."""


# --------------------------------------------------------------------------
# parsing
# --------------------------------------------------------------------------

_WS = re.compile(r"\s+")
_IDENT = re.compile(r"[A-Za-z_]\w*")
_NODE_OPEN = re.compile(r"\(\s*")
_LABEL = re.compile(r":\s*(Link|Category|Keyword)")
_REL_FWD = re.compile(r"-\s*\[\s*:\s*(\w+)\s*\]\s*->")
_REL_BWD = re.compile(r"<-\s*\[\s*:\s*(\w+)\s*\]\s*-")
# undirected: -[:REL]- with no arrowhead on either side (the lookahead
# keeps it from swallowing the forward form's prefix)
_REL_UND = re.compile(r"-\s*\[\s*:\s*(\w+)\s*\]\s*-(?!>)")
_NUMBER = re.compile(r"-?\d+(\.\d+)?")


def _limit_count(p: "_P") -> int:
    """Parse a LIMIT operand: a non-negative integer. A fractional or
    negative literal is a statement error, not a Python ValueError
    escaping the translator."""
    m = p.expect(_NUMBER, "limit count")
    if m.group(1) or m.group(0).startswith("-"):
        raise CypherSyntaxError(
            f"LIMIT takes a non-negative integer, got {m.group(0)!r}"
        )
    return int(m.group(0))


# variable-length hops: undirected -[*1..h]- / -[:REL*1..h]-, and the
# directed forms -[:REL*1..h]-> / <-[:REL*1..h]- (r7 verdict item 8)
_REL_VAR = re.compile(r"-\s*\[\s*(?::\s*(\w+)\s*)?\*([^\]]*)\]\s*-(?!>)")
_REL_VAR_FWD = re.compile(r"-\s*\[\s*(?::\s*(\w+)\s*)?\*([^\]]*)\]\s*->")
_REL_VAR_BWD = re.compile(r"<-\s*\[\s*(?::\s*(\w+)\s*)?\*([^\]]*)\]\s*-")
_VAR_SPEC = re.compile(r"^\s*(\d+)\s*\.\.\s*(\d+)\s*$")
# leftover var-length bracket (malformed): targeted error
_VAR_PROBE = re.compile(r"(<-|-)\s*\[[^\]]*\*")
_STRING = re.compile(r"'((?:[^'\\]|\\.)*)'")
_PARAM = re.compile(r"\$(\w+)")
_CMP = re.compile(r"(<>|<=|>=|=|<|>)")


@dataclass
class _Node:
    var: str
    label: str | None
    props: dict[str, object] = field(default_factory=dict)


@dataclass
class _Hop:
    src_var: str
    rel: str
    dst_var: str
    forward: bool | None  # None: undirected, resolved against labels
    var_len: int | None = None  # [*1..h] upper bound; None: single hop


class _P:
    """Cursor over the statement text."""

    def __init__(self, text: str, params: dict | None):
        self.text = text
        self.pos = 0
        self.params = params or {}
        self._anon = 0

    def skip_ws(self) -> None:
        m = _WS.match(self.text, self.pos)
        if m:
            self.pos = m.end()

    def at_end(self) -> bool:
        self.skip_ws()
        return self.pos >= len(self.text)

    def peek_kw(self, kw: str) -> bool:
        self.skip_ws()
        return self.text[self.pos : self.pos + len(kw)].upper() == kw and not _IDENT.match(
            self.text, self.pos + len(kw)
        )

    def take_kw(self, kw: str) -> bool:
        if self.peek_kw(kw):
            self.pos += len(kw)
            return True
        return False

    def expect_kw(self, kw: str) -> None:
        if not self.take_kw(kw):
            raise CypherSyntaxError(f"expected {kw} at: {self.text[self.pos:][:40]!r}")

    def take(self, regex: re.Pattern):
        self.skip_ws()
        m = regex.match(self.text, self.pos)
        if m:
            self.pos = m.end()
        return m

    def expect(self, regex: re.Pattern, what: str):
        m = self.take(regex)
        if not m:
            raise CypherSyntaxError(
                f"expected {what} at: {self.text[self.pos:][:40]!r}"
            )
        return m

    def take_char(self, ch: str) -> bool:
        self.skip_ws()
        if self.pos < len(self.text) and self.text[self.pos] == ch:
            self.pos += 1
            return True
        return False

    def anon(self) -> str:
        self._anon += 1
        return f"__anon{self._anon}"

    # -- values -----------------------------------------------------------

    def value(self):
        m = self.take(_PARAM)
        if m:
            name = m.group(1)
            if name not in self.params:
                raise CypherSyntaxError(f"missing parameter ${name}")
            return self.params[name]
        m = self.take(_STRING)
        if m:
            return m.group(1).replace("\\'", "'")
        m = self.take(_NUMBER)
        if m:
            return float(m.group(0)) if m.group(1) else int(m.group(0))
        if self.take_kw("NULL"):
            return None
        raise CypherSyntaxError(f"expected value at: {self.text[self.pos:][:40]!r}")

    # -- patterns ---------------------------------------------------------

    def node(self) -> _Node:
        self.expect(_NODE_OPEN, "'('")
        m = self.take(_IDENT)
        var = m.group(0) if m else self.anon()
        lm = self.take(_LABEL)
        label = lm.group(1) if lm else None
        props: dict[str, object] = {}
        if self.take_char("{"):
            while True:
                key = self.expect(_IDENT, "property name").group(0)
                if not self.take_char(":"):
                    raise CypherSyntaxError("expected ':' in property map")
                props[key] = self.value()
                if not self.take_char(","):
                    break
            if not self.take_char("}"):
                raise CypherSyntaxError("expected '}' closing property map")
        if not self.take_char(")"):
            raise CypherSyntaxError(
                f"expected ')' at: {self.text[self.pos:][:40]!r}"
            )
        return _Node(var, label, props)

    def chain(self) -> tuple[list[_Node], list[_Hop]]:
        nodes = [self.node()]
        hops: list[_Hop] = []
        while True:
            self.skip_ws()
            var_len = None
            fm = self.take(_REL_FWD)
            if fm:
                rel, forward = fm.group(1), True
            else:
                bm = self.take(_REL_BWD)
                if bm:
                    rel, forward = bm.group(1), False
                else:
                    # directed var-length before undirected: the
                    # undirected pattern's (?!>) keeps it from
                    # swallowing the forward form's prefix, but order
                    # still matters for the backward form
                    vbm = self.take(_REL_VAR_BWD)
                    vfm = None if vbm else self.take(_REL_VAR_FWD)
                    vm = None if (vbm or vfm) else self.take(_REL_VAR)
                    if vbm or vfm or vm:
                        m_ = vbm or vfm or vm
                        forward = True if vfm else (False if vbm else None)
                        rel = m_.group(1) or "HAS_KEYWORD"
                        var_len = _parse_var_spec(m_.group(2), rel)
                    else:
                        um = self.take(_REL_UND)
                        if not um:
                            if _VAR_PROBE.match(self.text, self.pos):
                                raise CypherSyntaxError(
                                    "malformed variable-length "
                                    "relationship (expected [*1..h])"
                                )
                            break
                        rel, forward = um.group(1), None
            if rel not in REL_ENDPOINTS:
                raise CypherSyntaxError(f"unknown relationship type {rel}")
            nxt = self.node()
            hops.append(_Hop(nodes[-1].var, rel, nxt.var, forward, var_len))
            nodes.append(nxt)
        return nodes, hops

    def patterns(self) -> tuple[list[_Node], list[_Hop], list[list[str]]]:
        """All comma-separated chains; returns (nodes, hops, chain var
        groups in order)."""
        all_nodes: list[_Node] = []
        all_hops: list[_Hop] = []
        groups: list[list[str]] = []
        while True:
            nodes, hops = self.chain()
            all_nodes.extend(nodes)
            all_hops.extend(hops)
            groups.append([n.var for n in nodes])
            if not self.take_char(","):
                break
        return all_nodes, all_hops, groups


# --------------------------------------------------------------------------
# semantic analysis shared by read + write paths
# --------------------------------------------------------------------------



def _parse_var_spec(spec: str, rel: str) -> int:
    """Validate a ``[*...]`` hop spec: only the bounded ``1..h`` form
    compiles (to :func:`..algorithms.bounded_reach`, whose radii are
    cumulative from 1). Unbounded ``*`` would be an unbounded
    transitive closure — refused, the unbound-anchor discipline."""
    m = _VAR_SPEC.match(spec)
    if not m:
        raise CypherSyntaxError(
            f"unsupported variable-length spec [*{spec.strip()}]: only the "
            "bounded form [*1..h] is supported (unbounded * would be an "
            "unbounded transitive closure)"
        )
    lo, hi = int(m.group(1)), int(m.group(2))
    if lo != 1 or hi < 1:
        raise CypherSyntaxError(
            "variable-length lower bound must be 1 (reach counts are "
            "cumulative radii: [*1..h])"
        )
    if rel not in REL_ENDPOINTS:
        raise CypherSyntaxError(f"unknown relationship type {rel}")
    return hi


def _resolve_undirected(nodes: list[_Node], hops: list[_Hop]) -> None:
    """Orient ``-[:REL]-`` hops in place: the schema is typed, so one
    labeled endpoint (declared on either node, anywhere in the
    statement) determines the direction. Raises when neither endpoint's
    label is known — an undirected hop between two unlabeled variables
    is genuinely ambiguous here."""
    declared = {n.var: n.label for n in nodes if n.label}
    for h in hops:
        if h.forward is not None or h.var_len:
            continue
        src_label, dst_label = REL_ENDPOINTS[h.rel]
        a = declared.get(h.src_var)
        b = declared.get(h.dst_var)
        if a == src_label or b == dst_label:
            h.forward = True
        elif a == dst_label or b == src_label:
            h.forward = False
        else:
            raise CypherSyntaxError(
                f"undirected -[:{h.rel}]- needs a labeled endpoint to "
                f"orient ({h.src_var!r}/{h.dst_var!r} are unlabeled)"
            )


def _labels_of(nodes: list[_Node], hops: list[_Hop]) -> dict[str, str]:
    labels: dict[str, str] = {}

    def bind(var: str, label: str) -> None:
        if labels.get(var, label) != label:
            raise CypherSyntaxError(
                f"variable {var!r}: conflicting labels {labels[var]} / {label}"
            )
        labels[var] = label

    for n in nodes:
        if n.label:
            bind(n.var, n.label)
    for h in hops:
        src_l, dst_l = REL_ENDPOINTS[h.rel]
        if h.forward:
            bind(h.src_var, src_l), bind(h.dst_var, dst_l)
        else:
            bind(h.src_var, dst_l), bind(h.dst_var, src_l)
    for n in nodes:
        if n.var not in labels:
            raise CypherSyntaxError(f"variable {n.var!r} has no label")
    return labels


# --------------------------------------------------------------------------
# read statements
# --------------------------------------------------------------------------


@dataclass
class _Cmp:
    left: tuple  # ("prop", var, prop) | ("lit", value)
    op: str  # = <> < > <= >= isnull notnull
    right: tuple | None


def _operand(p: _P) -> tuple:
    save = p.pos
    m = p.take(_IDENT)
    if m and p.take_char("."):
        prop = p.expect(_IDENT, "property name").group(0)
        return ("prop", m.group(0), prop)
    p.pos = save
    return ("lit", p.value())


@dataclass
class _Bool:
    """Boolean combinator over predicates: op in ('and','or','not'),
    children are _Bool or _Cmp nodes."""

    op: str
    children: list


def _comparison(p: _P) -> _Cmp:
    left = _operand(p)
    if p.take_kw("IS"):
        neg = p.take_kw("NOT")
        p.expect_kw("NULL")
        return _Cmp(left, "notnull" if neg else "isnull", None)
    if p.take_kw("CONTAINS"):
        return _Cmp(left, "contains", _operand(p))
    if p.take_kw("STARTS"):
        p.expect_kw("WITH")
        return _Cmp(left, "startswith", _operand(p))
    if p.take_kw("ENDS"):
        p.expect_kw("WITH")
        return _Cmp(left, "endswith", _operand(p))
    op = p.expect(_CMP, "comparison operator").group(1)
    return _Cmp(left, op, _operand(p))


def _bool_factor(p: _P):
    if p.take_kw("NOT"):
        return _Bool("not", [_bool_factor(p)])
    save = p.pos
    if p.take_char("("):
        # could be a parenthesized expression — or an operand never
        # starts with '(', so this is unambiguous in WHERE position
        inner = _bool_expr(p)
        if not p.take_char(")"):
            raise CypherSyntaxError("expected ')' in WHERE expression")
        return inner
    p.pos = save
    return _comparison(p)


def _bool_expr(p: _P):
    terms = [_bool_factor(p)]
    while p.take_kw("AND"):
        terms.append(_bool_factor(p))
    node = terms[0] if len(terms) == 1 else _Bool("and", terms)
    if p.take_kw("OR"):
        rhs = _bool_expr(p)
        return _Bool("or", [node, rhs])
    return node


def _where(p: _P) -> list:
    """Parse a WHERE expression (AND/OR/NOT with parentheses; AND
    binds tighter than OR) and flatten the TOP-LEVEL conjunction into
    a list — consumers filter each conjunct independently, and the
    unbound-anchor guard inspects only plain top-level equalities (an
    equality under OR/NOT guarantees nothing)."""
    node = _bool_expr(p)
    if isinstance(node, _Bool) and node.op == "and":
        return node.children
    return [node]


class _Frame:
    """The evolving DataFrame + bookkeeping: which vars are bound (key
    column = var name) and which (var, prop) Link columns are joined in
    (column name ``__{var}__{prop}``)."""

    def __init__(self, g: PropertyGraph, labels: dict[str, str]):
        self.g = g
        self.labels = labels
        self.df: DataFrame | None = None
        self.joined_props: set[str] = set()

    def prop_col(self, var: str, prop: str) -> Column:
        label = self.labels[var]
        if label in ("Category", "Keyword"):
            if prop != "name":
                raise CypherSyntaxError(f"{label} has no property {prop!r}")
            return F.col(var)
        if prop == "url":
            return F.col(var)
        self._ensure_link_props(var)
        return F.col(f"__{var}__{prop}")

    def _ensure_link_props(self, var: str) -> None:
        if var in self.joined_props:
            return
        props = self.g.links.select(
            *[F.col(c).alias(f"__{var}__{c}") for c in self.g.links.columns]
        )
        self.df = self.df.join(
            props, F.col(var) == F.col(f"__{var}__url"), "left"
        ).drop(f"__{var}__url")
        self.joined_props.add(var)


def _compile_match(
    g: PropertyGraph, nodes, hops, groups, labels: dict | None = None
) -> _Frame:
    if labels is None:
        labels = _labels_of(nodes, hops)
    fr = _Frame(g, labels)
    node_tables = {"Link": g.links, "Category": g.categories, "Keyword": g.keywords}
    edge_tables = {"BELONGS_TO": g.belongs_to, "HAS_KEYWORD": g.has_keyword}

    bound: set[str] = set()
    hop_ix = 0
    hops_by_chain: list[list[_Hop]] = []
    it = iter(hops)
    for grp in groups:
        hops_by_chain.append([next(it) for _ in range(len(grp) - 1)])

    for grp, chain_hops in zip(groups, hops_by_chain):
        anchor = grp[0]
        if anchor not in bound:
            lbl = labels[anchor]
            start = node_tables[lbl].select(F.col(NODE_KEY[lbl]).alias(anchor))
            fr.df = start if fr.df is None else fr.df.crossJoin(start)
            bound.add(anchor)
        for h in chain_hops:
            hop_ix += 1
            et = edge_tables[h.rel]
            link_end, other_end = (
                (h.src_var, h.dst_var) if h.forward else (h.dst_var, h.src_var)
            )
            edges = et.select(
                F.col("src_url").alias(f"__s{hop_ix}"),
                F.col(et.columns[1]).alias(f"__d{hop_ix}"),
            )
            # join on whichever endpoint is already bound (chain order
            # guarantees src_var is; multi-chain anchors may bind dst)
            if h.src_var in bound:
                known, kcol = h.src_var, (
                    f"__s{hop_ix}" if h.src_var == link_end else f"__d{hop_ix}"
                )
                new = h.dst_var
            else:
                known, kcol = h.dst_var, (
                    f"__s{hop_ix}" if h.dst_var == link_end else f"__d{hop_ix}"
                )
                new = h.src_var
            ncol = f"__d{hop_ix}" if kcol == f"__s{hop_ix}" else f"__s{hop_ix}"
            fr.df = fr.df.join(edges, F.col(known) == F.col(kcol))
            if new in bound:
                fr.df = fr.df.filter(F.col(new) == F.col(ncol))
            else:
                fr.df = fr.df.withColumn(new, F.col(ncol))
                bound.add(new)
            fr.df = fr.df.drop(f"__s{hop_ix}", f"__d{hop_ix}")

    # inline property maps -> equality filters. NOTE: prop_col may join
    # the Link property table into fr.df, so it must run before the
    # .filter method is bound to (the old) fr.df.
    for n in nodes:
        for k, v in n.props.items():
            cond = fr.prop_col(n.var, k) == F.lit(v)
            fr.df = fr.df.filter(cond)
    return fr


def _guard_unbound_anchors(nodes, groups, where: list[_Cmp]) -> None:
    """Refuse disconnected chains with unbound anchors before compiling
    (see :class:`CypherUnboundAnchorError`). A later chain's anchor is
    acceptable when it (a) reuses a variable an earlier chain bound,
    (b) carries an inline property map, or (c) appears in a WHERE
    equality — ``var.prop = literal`` (selective point bind, the
    reference's point-lookup shape) or ``var.prop = other.prop``
    (Catalyst rewrites the cross join + equality filter into an
    equi-join, reconnecting the chains)."""
    props = {n.var: n.props for n in nodes}
    eq_vars: set[str] = set()
    for c in where:
        if c.op == "=" and c.right is not None:
            for side in (c.left, c.right):
                if side[0] == "prop":
                    eq_vars.add(side[1])
    bound: set[str] = set()
    for i, grp in enumerate(groups):
        anchor = grp[0]
        if (
            i
            and anchor not in bound
            and not props.get(anchor)
            and anchor not in eq_vars
        ):
            raise CypherUnboundAnchorError(
                f"pattern chain anchored at ({anchor}) shares no variable "
                "with earlier chains and has no property binding — this "
                "would cross-join the full node table; bind it with an "
                "inline property map or a WHERE equality"
            )
        bound.update(grp)


def _cmp_to_column(fr: _Frame, c: _Cmp) -> Column:
    def side(t) -> Column:
        if t[0] == "prop":
            return fr.prop_col(t[1], t[2])
        return F.lit(t[1])

    left = side(c.left)
    if c.op == "isnull":
        return left.isNull()
    if c.op == "notnull":
        return left.isNotNull()
    right = side(c.right)
    return {
        "=": left == right,
        "<>": left != right,
        "<": left < right,
        ">": left > right,
        "<=": left <= right,
        ">=": left >= right,
        # Cypher string predicates: null operands propagate to null,
        # which the WHERE filter drops — same as openCypher semantics
        "contains": left.contains(right),
        "startswith": left.startswith(right),
        "endswith": left.endswith(right),
    }[c.op]


def _pred_to_column(fr: _Frame, node) -> Column:
    """Compile a WHERE node (_Cmp leaf or _Bool combinator) to a
    Column; three-valued logic comes free from Spark's boolean ops."""
    if isinstance(node, _Bool):
        if node.op == "not":
            return ~_pred_to_column(fr, node.children[0])
        cols = [_pred_to_column(fr, ch) for ch in node.children]
        out = cols[0]
        for c in cols[1:]:
            out = (out & c) if node.op == "and" else (out | c)
        return out
    return _cmp_to_column(fr, node)


def _compile_reach(
    g: PropertyGraph,
    p: _P,
    nodes: list[_Node],
    hops: list[_Hop],
    groups: list[list[str]],
) -> DataFrame:
    """Compile the variable-length reach-count statement shape

        MATCH (n[:Label][{key: v}])-[[:REL]*1..h]-[>](m)
        [WHERE n.key = v] RETURN n[.key] [AS a], COUNT(DISTINCT m) [AS b]
        [ORDER BY ...] [LIMIT n]

    to :func:`..algorithms.bounded_reach`: COUNT(DISTINCT m) is the
    radius-h reach count ``n_reach_h``, and a key binding (inline map
    or WHERE equality) becomes the ``seeds`` frame — the first frontier
    is semi-joined down before any expansion, so a point query never
    pays the corpus closure. The rel label picks the typed edge table
    (HAS_KEYWORD default, BELONGS_TO supported) and an arrowhead makes
    the expansion directed (``-[:REL*1..h]->`` follows the arrows,
    ``<-...-`` goes against them; no arrow = both directions — the
    classic bipartite closure). Shapes beyond this (extra chains,
    constrained targets, non-key predicates) raise
    :class:`CypherSyntaxError` — they would need the pair sets
    themselves, which the reach operator deliberately never
    materializes to the driver."""
    from .algorithms import bounded_reach

    if len(groups) != 1 or len(hops) != 1 or len(nodes) != 2:
        raise CypherSyntaxError(
            "a variable-length MATCH must be a single two-node pattern"
        )
    n, m2 = nodes
    hop = hops[0]
    h = hop.var_len
    if m2.label or m2.props:
        raise CypherSyntaxError(
            "the variable-length reach target must be an unconstrained "
            "variable (reach counts span both node types)"
        )
    # direction + rel label determine the edge frame (r7 verdict
    # item 8): undirected HAS_KEYWORD keeps the classic bipartite
    # Link<->Keyword closure; -[:REL*1..h]-> expands along the rel's
    # arrows only (and <-...- against them). The anchor's label must
    # sit on the side its arrows leave from, or the statement is
    # vacuous — refused rather than silently empty.
    src_l, dst_l = REL_ENDPOINTS[hop.rel]
    if hop.forward is True:
        anchor_ok = (None, src_l)
    elif hop.forward is False:
        anchor_ok = (None, dst_l)
    else:
        anchor_ok = (None, src_l, dst_l)
    if n.label not in anchor_ok:
        raise CypherSyntaxError(
            f"variable-length -[:{hop.rel}*1..{h}]"
            f"{'->' if hop.forward else '-'} cannot start at a "
            f"{n.label} node (its edges touch {src_l}/{dst_l} only, "
            "in the pattern's direction)"
        )
    key = NODE_KEY.get(n.label) if n.label else None
    seed_vals: list[object] = []
    if n.props:
        if n.label is None or set(n.props) != {key}:
            raise CypherSyntaxError(
                "a variable-length anchor's property map may bind only "
                "its key property"
            )
        seed_vals.append(n.props[key])
    if p.take_kw("WHERE"):
        for c in _where(p):
            if (
                c.op == "="
                and c.left == ("prop", n.var, key)
                and c.right is not None
                and c.right[0] == "lit"
            ):
                seed_vals.append(c.right[1])
            else:
                raise CypherSyntaxError(
                    "variable-length WHERE supports only an equality on "
                    "the anchor's key property"
                )

    prefix = f"{n.label}:" if n.label else None
    seeds = None
    if seed_vals:
        # seeded expansion: the first frontier is semi-joined down
        # before any join, so the point query pays its own closure only.
        # An inline map binding AND a WHERE equality are conjunctive
        # (Cypher AND = intersection): two different bound values
        # intersect to the empty seed set, never the union of both
        distinct = sorted({str(v) for v in seed_vals})
        ids = (
            [(f"{prefix}{distinct[0]}",)] if len(distinct) == 1 else []
        )
        seeds = g.links.sparkSession.createDataFrame(
            ids, "node_id string"
        )
    edges = None
    if hop.forward is not None or hop.rel != "HAS_KEYWORD":
        # non-default traversal: build the rel's typed edge frame in
        # the requested direction (the default undirected HAS_KEYWORD
        # case keeps edges=None → bounded_reach's own bipartite frame,
        # byte-identical to the pre-r8 plan)
        etab = g.has_keyword if hop.rel == "HAS_KEYWORD" else g.belongs_to
        dst_col = "dst_keyword" if hop.rel == "HAS_KEYWORD" else "dst_category"
        fwd = etab.select(
            F.concat(F.lit(f"{src_l}:"), F.col("src_url")).alias("src"),
            F.concat(F.lit(f"{dst_l}:"), F.col(dst_col)).alias("dst"),
        )
        rev = fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        if hop.forward is True:
            edges = fwd
        elif hop.forward is False:
            edges = rev
        else:
            edges = fwd.unionByName(rev)
    reach = bounded_reach(g, max_hops=h, seeds=seeds, edges=edges)
    if prefix:
        reach = reach.filter(F.col("node_id").startswith(prefix))
        key_col = F.col("node_id").substr(F.lit(len(prefix) + 1), F.lit(2**30))
    else:
        key_col = F.col("node_id")
    count_col = F.col(f"n_reach_{h}")

    # RETURN: n[.key] [AS a], COUNT(DISTINCT m) [AS b] — either order
    p.expect_kw("RETURN")
    items: list[tuple[str, Column]] = []
    saw_count = False
    while True:
        if p.take_kw("COUNT"):
            if not p.take_char("("):
                raise CypherSyntaxError("expected '(' after COUNT")
            if not p.take_kw("DISTINCT"):
                raise CypherSyntaxError(
                    "variable-length RETURN needs COUNT(DISTINCT "
                    f"{m2.var}) — reach counts are distinct by definition"
                )
            v = p.expect(_IDENT, "variable").group(0)
            if v != m2.var:
                raise CypherSyntaxError(
                    f"COUNT(DISTINCT {v}): {v!r} is not the reach target"
                )
            if not p.take_char(")"):
                raise CypherSyntaxError("expected ')' closing COUNT")
            name = f"COUNT(DISTINCT {v})"
            if p.take_kw("AS"):
                name = p.expect(_IDENT, "alias").group(0)
            items.append((name, count_col))
            saw_count = True
        else:
            v = p.expect(_IDENT, "variable").group(0)
            if v != n.var:
                raise CypherSyntaxError(
                    f"variable-length RETURN may project only the anchor "
                    f"{n.var!r} and COUNT(DISTINCT {m2.var})"
                )
            name = v
            if p.take_char("."):
                prop = p.expect(_IDENT, "property name").group(0)
                if key is None or prop != key:
                    raise CypherSyntaxError(
                        "variable-length RETURN projects the anchor's key "
                        f"property only ({key!r})"
                    )
                name = f"{v}.{prop}"
            if p.take_kw("AS"):
                name = p.expect(_IDENT, "alias").group(0)
            items.append((name, key_col))
        if not p.take_char(","):
            break
    if not saw_count:
        raise CypherSyntaxError(
            f"variable-length RETURN must include COUNT(DISTINCT {m2.var})"
        )
    out = reach.select(*[col.alias(name) for name, col in items])

    if p.take_kw("ORDER"):
        p.expect_kw("BY")
        order_cols = []
        out_names = set(out.columns)
        while True:
            v = p.expect(_IDENT, "order key").group(0)
            name = v
            if p.take_char("."):
                name = f"{v}.{p.expect(_IDENT, 'property name').group(0)}"
            if name not in out_names:
                raise CypherSyntaxError(
                    f"ORDER BY key {name!r} must appear in RETURN"
                )
            c = F.col(f"`{name}`")
            if p.take_kw("DESC"):
                c = c.desc()
            else:
                p.take_kw("ASC")
            order_cols.append(c)
            if not p.take_char(","):
                break
        out = out.orderBy(*order_cols)
    if p.take_kw("LIMIT"):
        out = out.limit(_limit_count(p))
    if not p.at_end():
        raise CypherSyntaxError(f"trailing input: {p.text[p.pos:][:40]!r}")
    return out


_SHORTEST_HEAD = re.compile(r"(\w+)\s*=\s*shortestPath\s*\(", re.IGNORECASE)


def _compile_shortest_path(g: PropertyGraph, p: _P, pvar: str) -> DataFrame:
    """Compile the two shortest-path statement shapes

        MATCH p = shortestPath((n:L {key: v})-[[:REL]*1..h]-(m:L {key: v}))
        RETURN length(p) [AS alias]

        MATCH p = shortestPath((n:L {key: v})-[[:REL]*1..h]-(m[:L]))
        RETURN m.<key> [AS alias], length(p) [AS alias]

    to :func:`..algorithms.bfs_distances_from_edges`. The first form
    (both endpoints key-bound) answers "how far is X from Y": one row
    with the hop count, or zero rows when no path exists within h
    (Cypher's no-match semantics). The second form leaves one endpoint
    free — "how far is X from everything" — and returns the whole
    distance table restricted to the free endpoint's label (inferred
    from the projected key property when unlabelled: ``url`` → Link,
    ``name`` → the relationship's non-Link endpoint); the seed itself
    is excluded because ``[*1..h]`` paths have at least one hop. Either
    endpoint of the pattern may be the bound one.

    The hop must be the bounded var-length form (``[*1..h]`` — the
    front end's standing rule; BFS honors h as its hop cap), in any of
    the three orientations: undirected ``-[*1..h]-``, forward
    ``-[*1..h]->``, backward ``<-[*1..h]-``. Directed forms run the
    BFS with ``directed=True`` over an edge frame oriented so arrows
    point away from the seed, whichever written end the seed is. The
    BFS never enumerates paths — frontier supersteps with a
    settled-set anti-join, so the statement stays corpus-safe at any
    radius."""
    from .algorithms import bfs_distances_from_edges

    nodes, hops, groups = p.patterns()
    if not p.take_char(")"):
        raise CypherSyntaxError("expected ) closing shortestPath(...)")
    if len(nodes) != 2 or len(hops) != 1 or len(groups) != 1:
        raise CypherSyntaxError(
            "shortestPath takes a single two-node pattern"
        )
    hop = hops[0]
    if hop.var_len is None:
        raise CypherSyntaxError(
            "shortestPath requires the bounded var-length form [*1..h]"
        )
    # hop.forward: None = undirected; True = -[*1..h]-> (arrow from
    # the first written node); False = <-[*1..h]- . Directed forms run
    # the same BFS with directed=True over an edge frame oriented so
    # arrows point AWAY from the seed (r9 verdict item 3 — plain
    # var-length hops already parse both arrows; this closes the
    # front-end refusal at the old cypher.py:873).
    directed = hop.forward is not None
    src_rel_l, dst_rel_l = REL_ENDPOINTS[hop.rel]
    ends: list[str | None] = []
    for node in nodes:
        if not node.props:
            ends.append(None)  # free endpoint
            continue
        label = node.label
        if label is None and len(node.props) == 1:
            # unlabelled bound end: the key property names the label
            # (url → Link, name → the rel's non-Link endpoint) — the
            # reference's own query style binds with bare {url: $u}
            prop = next(iter(node.props))
            if prop == "url":
                label = "Link"
            elif prop == "name":
                label = dst_rel_l
        key = NODE_KEY.get(label) if label else None
        if not label or set(node.props) != {key}:
            raise CypherSyntaxError(
                "a bound shortestPath endpoint must bind exactly its "
                "key property"
            )
        ends.append(f"{label}:{node.props[key]}")
    if ends[0] is None and ends[1] is None:
        raise CypherSyntaxError(
            "shortestPath needs at least one key-bound endpoint"
        )
    if ends[0] is not None and ends[0] == ends[1]:
        # a [*1..h] path has at least one hop, so the shortest path
        # from a node to ITSELF is a cycle — which a distance table
        # (dist 0 at the seed) cannot answer; refusing beats silently
        # returning the impossible length 0
        raise CypherSyntaxError(
            "shortestPath endpoints must differ (a [*1..h] path has "
            "at least one hop; same-node cycle search is unsupported)"
        )
    etab = g.has_keyword if hop.rel == "HAS_KEYWORD" else g.belongs_to
    dst_col = "dst_keyword" if hop.rel == "HAS_KEYWORD" else "dst_category"
    fwd = etab.select(
        F.concat(F.lit(f"{src_rel_l}:"), F.col("src_url")).alias("src"),
        F.concat(F.lit(f"{dst_rel_l}:"), F.col(dst_col)).alias("dst"),
    )

    def oriented(seed_idx: int) -> DataFrame:
        """The edge frame with arrows pointing away from the seed: the
        pattern's arrow direction is relative to the WRITTEN order, so
        a backward arrow or a seed at the second written node reverses
        the frame (two reversals cancel)."""
        if not directed or (hop.forward is True) == (seed_idx == 0):
            return fwd
        return fwd.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )

    p.expect_kw("RETURN")

    if None in ends:
        # free-endpoint form: distances from the bound seed to every
        # node of the free endpoint's label, via the RETURN projection
        bound_id = ends[0] if ends[0] is not None else ends[1]
        free = nodes[ends.index(None)]
        if free.label and free.label not in (src_rel_l, dst_rel_l):
            raise CypherSyntaxError(
                f"free endpoint label {free.label!r} is not an endpoint "
                f"of {hop.rel}"
            )
        v = p.expect(_IDENT, "free endpoint variable").group(0)
        if v != free.var:
            raise CypherSyntaxError(
                f"free-endpoint shortestPath RETURN must project "
                f"{free.var}.<key> then length({pvar})"
            )
        if not p.take_char("."):
            raise CypherSyntaxError(
                f"expected property access on {free.var}"
            )
        prop = p.expect(_IDENT, "property name").group(0)
        if free.label:
            if prop != NODE_KEY[free.label]:
                raise CypherSyntaxError(
                    f"free endpoint projects its key property only "
                    f"({NODE_KEY[free.label]!r})"
                )
            free_label = free.label
        elif prop == "url":
            free_label = "Link"
        elif prop == "name":
            free_label = dst_rel_l  # the rel's non-Link endpoint
        else:
            raise CypherSyntaxError(
                f"cannot infer the free endpoint's label from "
                f"property {prop!r} (use url or name, or label the node)"
            )
        key_alias = f"{v}.{prop}"
        if p.take_kw("AS"):
            key_alias = p.expect(_IDENT, "alias").group(0)
        if not p.take_char(","):
            raise CypherSyntaxError(
                f"free-endpoint shortestPath RETURN must also project "
                f"length({pvar})"
            )
        m = p.take(re.compile(r"length\s*\(\s*(\w+)\s*\)", re.IGNORECASE))
        if not m or m.group(1) != pvar:
            raise CypherSyntaxError(
                f"shortestPath RETURN must end with length({pvar})"
            )
        len_alias = f"length({pvar})"
        if p.take_kw("AS"):
            len_alias = p.expect(_IDENT, "alias").group(0)
        seeds = g.links.sparkSession.createDataFrame(
            [(bound_id,)], "node_id string"
        )
        dist = bfs_distances_from_edges(
            oriented(1 - ends.index(None)),
            seeds,
            max_hops=hop.var_len,
            directed=directed,
        )
        pref = free_label + ":"
        out = (
            dist.filter(
                (F.col("node_id") != bound_id)
                & F.col("node_id").startswith(pref)
            )
            .select(
                F.col("node_id").substr(F.lit(len(pref) + 1), F.length("node_id"))
                .alias(key_alias),
                F.col("dist").alias(len_alias),
            )
        )
        # "nearest first" is the natural shape of a one-to-all distance
        # query — support ORDER BY over the two projected columns
        # (by alias, by the original m.<key> / length(p) spelling) + LIMIT
        if p.take_kw("ORDER"):
            p.expect_kw("BY")
            order_cols = []
            while True:
                m2 = p.take(
                    re.compile(r"length\s*\(\s*(\w+)\s*\)", re.IGNORECASE)
                )
                if m2:
                    if m2.group(1) != pvar:
                        raise CypherSyntaxError(
                            f"unknown path variable {m2.group(1)!r}"
                        )
                    name = len_alias
                else:
                    v2 = p.expect(_IDENT, "order key").group(0)
                    name = v2
                    if p.take_char("."):
                        name = f"{v2}.{p.expect(_IDENT, 'property name').group(0)}"
                    if name == f"{free.var}.{prop}":
                        name = key_alias
                if name not in (key_alias, len_alias):
                    raise CypherSyntaxError(
                        f"ORDER BY key {name!r} must appear in RETURN"
                    )
                c = F.col(f"`{name}`")
                if p.take_kw("DESC"):
                    c = c.desc()
                else:
                    p.take_kw("ASC")
                order_cols.append(c)
                if not p.take_char(","):
                    break
            out = out.orderBy(*order_cols)
        if p.take_kw("LIMIT"):
            out = out.limit(_limit_count(p))
        if not p.at_end():
            raise CypherSyntaxError(
                "trailing input after the shortestPath statement: "
                f"{p.text[p.pos:][:40]!r}"
            )
        return out

    m = p.take(
        re.compile(r"length\s*\(\s*(\w+)\s*\)", re.IGNORECASE)
    )
    if not m or m.group(1) != pvar:
        raise CypherSyntaxError(
            f"shortestPath RETURN must be length({pvar})"
        )
    alias = f"length({pvar})"
    if p.take_kw("AS"):
        alias = p.expect(_IDENT, "alias").group(0)
    if not p.at_end():
        raise CypherSyntaxError(
            "shortestPath statements end at RETURN length(p) [AS alias]"
        )
    seeds = g.links.sparkSession.createDataFrame(
        [(ends[0],)], "node_id string"
    )
    dist = bfs_distances_from_edges(
        oriented(0), seeds, max_hops=hop.var_len, directed=directed
    )
    return dist.filter(F.col("node_id") == ends[1]).select(
        F.col("dist").alias(alias)
    )


def cypher(g: PropertyGraph, query: str, params: dict | None = None) -> DataFrame:
    """Execute a read-only Cypher statement (MATCH … [WHERE …] RETURN …
    [ORDER BY …] [LIMIT n]) against the graph. See module docstring for
    the supported subset; raises :class:`CypherSyntaxError` outside it."""
    p = _P(query, params)
    p.expect_kw("MATCH")
    m_sp = p.take(_SHORTEST_HEAD)
    if m_sp:
        return _compile_shortest_path(g, p, m_sp.group(1))
    nodes, hops, groups = p.patterns()
    if any(h.var_len for h in hops):
        return _compile_reach(g, p, nodes, hops, groups)
    _resolve_undirected(nodes, hops)
    # WHERE is parsed before compiling so the unbound-anchor guard can
    # see equality bindings (the filters still apply post-compile)
    where: list[_Cmp] = []
    if p.take_kw("WHERE"):
        where = _where(p)
    _guard_unbound_anchors(nodes, groups, where)
    fr = _compile_match(g, nodes, hops, groups)
    for c in where:
        cond = _pred_to_column(fr, c)  # may join Link props into fr.df first
        fr.df = fr.df.filter(cond)

    # OPTIONAL MATCH clauses: each compiles standalone (its WHERE is
    # scoped to it, per openCypher — filtering inside the optional part
    # never removes mandatory rows) and LEFT-joins on the variables it
    # shares with what is already matched; unmatched rows carry nulls.
    main_vars = {v for grp in groups for v in grp}
    while p.take_kw("OPTIONAL"):
        p.expect_kw("MATCH")
        o_nodes, o_hops, o_groups = p.patterns()
        _resolve_undirected(nodes + o_nodes, o_hops)
        o_where: list[_Cmp] = []
        if p.take_kw("WHERE"):
            o_where = _where(p)
        o_vars = {v for grp in o_groups for v in grp}
        shared = sorted(main_vars & o_vars)
        if not shared:
            raise CypherSyntaxError(
                "OPTIONAL MATCH must share at least one variable with an "
                "earlier MATCH"
            )
        # chains anchored on an unshared variable need their own
        # binding, exactly like mandatory anchors
        unshared = [grp for grp in o_groups if grp[0] not in main_vars]
        if unshared:
            _guard_unbound_anchors(o_nodes, unshared, o_where)
        # label context accretes so an unlabeled shared anchor like
        # (l) resolves through the earlier clause's label
        labels_all = _labels_of(nodes + o_nodes, hops + o_hops)
        sub = _compile_match(g, o_nodes, o_hops, o_groups, labels=labels_all)
        for c in o_where:
            cond = _pred_to_column(sub, c)  # may join props into sub.df
            sub.df = sub.df.filter(cond)
        dup = [
            c
            for c in sub.df.columns
            if c in fr.df.columns and c not in shared
        ]
        sub_df = sub.df.drop(*dup) if dup else sub.df
        fr.df = fr.df.join(sub_df, shared, "left")
        fr.labels.update(sub.labels)
        fr.joined_props |= {
            v
            for v in sub.joined_props
            if any(c.startswith(f"__{v}__") for c in sub_df.columns)
        }
        main_vars |= o_vars
        nodes, hops = nodes + o_nodes, hops + o_hops

    p.expect_kw("RETURN")
    distinct = p.take_kw("DISTINCT")

    # RETURN items: var.prop [AS a] | COUNT(var|*) [AS a] | var [AS a]
    items: list[tuple[str, Column]] = []
    counts: list[tuple[str, Column]] = []
    order_names: list[str] = []
    while True:
        if p.take_kw("COUNT"):
            if not p.take_char("("):
                raise CypherSyntaxError("expected '(' after COUNT")
            if p.take_char("*"):
                col = F.count(F.lit(1))
                name = "COUNT(*)"
            else:
                v = p.expect(_IDENT, "variable").group(0)
                col = F.count(F.col(v))
                name = f"COUNT({v})"
            if not p.take_char(")"):
                raise CypherSyntaxError("expected ')' closing COUNT")
            if p.take_kw("AS"):
                name = p.expect(_IDENT, "alias").group(0)
            counts.append((name, col))
            order_names.append(name)
        else:
            v = p.expect(_IDENT, "variable").group(0)
            if p.take_char("."):
                prop = p.expect(_IDENT, "property name").group(0)
                col, name = fr.prop_col(v, prop), f"{v}.{prop}"
            else:
                col, name = F.col(v), v
            if p.take_kw("AS"):
                name = p.expect(_IDENT, "alias").group(0)
            items.append((name, col))
            order_names.append(name)
        if not p.take_char(","):
            break

    if counts:
        keys = [col.alias(name) for name, col in items]
        aggs = [col.alias(name) for name, col in counts]
        out = (
            fr.df.groupBy(*keys).agg(*aggs)
            if keys
            else fr.df.agg(*aggs)
        )
        out = out.select(*[F.col(f"`{n}`") for n in order_names])
    else:
        out = fr.df.select(*[col.alias(name) for name, col in items])
        if distinct:
            out = out.distinct()

    if p.take_kw("ORDER"):
        p.expect_kw("BY")
        order_cols = []
        out_names = set(out.columns)
        while True:
            save = p.pos
            v = p.expect(_IDENT, "order key").group(0)
            if p.take_char("."):
                prop = p.expect(_IDENT, "property name").group(0)
                name = f"{v}.{prop}"
            else:
                name = v
            if name not in out_names:
                p.pos = save
                raise CypherSyntaxError(
                    f"ORDER BY key {name!r} must appear in RETURN"
                )
            c = F.col(f"`{name}`")
            if p.take_kw("DESC"):
                c = c.desc()
            else:
                p.take_kw("ASC")
            order_cols.append(c)
            if not p.take_char(","):
                break
        out = out.orderBy(*order_cols)

    if p.take_kw("LIMIT"):
        out = out.limit(_limit_count(p))

    if not p.at_end():
        raise CypherSyntaxError(f"trailing input: {p.text[p.pos:][:40]!r}")
    return out


# --------------------------------------------------------------------------
# write statements (the reference's three shapes)
# --------------------------------------------------------------------------

_LABEL_TABLE = {"Link": "links", "Category": "categories", "Keyword": "keywords"}
_REL_TABLE = {"BELONGS_TO": "belongs_to", "HAS_KEYWORD": "has_keyword"}

# The notebook's lean Link schema (``Edits.ipynb c9:38``) names two
# properties differently from the app schema the store uses
# (``main.py:20``); the CSV preload already bridges them
# (``serving.preload_csv``: category → raw_category + suggested_category,
# keyword → the denormalized ``keywords`` string), so the write front
# end applies the same documented mapping instead of refusing the
# notebook's verbatim MERGE+SET strings (``c10:69-76``).
_LINK_PROP_ALIASES: dict[str, tuple[str, ...]] = {
    "category": ("raw_category", "suggested_category"),
    "keyword": ("keywords",),
}


def _link_prop_targets(prop: str) -> tuple[str, ...]:
    from .model import LINK_COLUMNS

    targets = _LINK_PROP_ALIASES.get(prop, (prop,))
    for t in targets:
        if t not in LINK_COLUMNS:
            raise CypherSyntaxError(f"Link has no property {prop!r}")
    return targets


def cypher_write(store, query: str, params: dict | None = None) -> None:
    """Execute a write statement against a :class:`GraphStore`:

    - ``MERGE (:Label {props})`` — node insert-if-absent (M1)
    - ``MERGE (l:Link {url: …}) SET l.prop = …, …`` — node upsert with
      per-property assignment (M2, the notebook's populate shape,
      ``Edits.ipynb c10:69-76``; the unlabeled ``MERGE (l {url: …})
      SET …`` form infers :Link from the url key, matching the
      free-endpoint shortestPath discipline). The notebook schema's
      ``category``/``keyword`` property names map onto the store
      schema the way the CSV preload maps them (see
      ``_LINK_PROP_ALIASES``).
    - ``MATCH (a:…{…}), (b:…{…}) MERGE (a)-[:REL]->(b)`` — relationship
      merge between two point-matched nodes (M3; endpoint existence is
      enforced by :meth:`GraphStore.merge_edges`, J6)
    - ``MATCH (l:Link {url: $url}) DETACH DELETE l`` — M4

    Matches the reference's exact write surface (``main.py:28-34,
    120-144, 313-337, 398-425, 490`` + the notebook populate loop);
    anything else raises.

    Documented divergence from full Cypher MERGE semantics (r10
    verdict item 6; both behaviors test-pinned):

    - MERGE matches on the PRIMARY KEY alone (url / name), not the
      whole property map. Real Cypher would treat a url-match with a
      differing ``title`` as no match and attempt a create (hitting
      the uniqueness constraint); here the existing row simply wins
      (no SET) or is updated per-property (SET). The reference's app
      guards every MERGE with a prior existence check
      (``main.py:367-371``), so observable behavior on reference
      shapes is identical.
    - With SET, a NON-SET property in the MERGE map fills a NULL
      stored value on an existing row (the coalesce in
      :meth:`GraphStore.merge_set_links` — the map value is "what we
      know now", better than keeping NULL); a non-NULL stored value
      always wins over the map. Without SET, the map's non-key
      properties are ignored entirely for existing rows
      (insert-if-absent, M1)."""
    from .model import LINK_COLUMNS

    p = _P(query, params)
    if p.take_kw("MERGE"):
        n = p.node()
        assigns: list[tuple[str, str, object]] = []
        if p.take_kw("SET"):
            while True:
                v = p.expect(_IDENT, "variable").group(0)
                if not p.take_char("."):
                    raise CypherSyntaxError("SET expects var.property = value")
                prop = p.expect(_IDENT, "property name").group(0)
                if not p.take_char("="):
                    raise CypherSyntaxError("expected '=' in SET")
                assigns.append((v, prop, p.value()))
                if not p.take_char(","):
                    break
        if not p.at_end():
            raise CypherSyntaxError("MERGE supports a single node pattern")
        label = n.label
        if label is None:
            # label inference from the key property, the free-endpoint
            # shortestPath discipline: url keys exactly one label
            if "url" in n.props:
                label = "Link"
            else:
                raise CypherSyntaxError(
                    "unlabeled MERGE needs a {url: …} key to infer :Link "
                    "(a {name: …} key is ambiguous between Category and "
                    "Keyword — label it)"
                )
        for v, _, _ in assigns:
            if v != n.var:
                raise CypherSyntaxError(
                    f"SET references {v!r}, but the MERGE binds {n.var!r}"
                )
        if label == "Link":
            row: dict[str, object] = {c: None for c in LINK_COLUMNS}
            for prop, val in n.props.items():
                for c in _link_prop_targets(prop):
                    row[c] = val
            set_cols: list[str] = []
            for _, prop, val in assigns:
                for c in _link_prop_targets(prop):
                    row[c] = val
                    if c not in set_cols:
                        set_cols.append(c)
            if row["url"] is None:
                raise CypherSyntaxError("MERGE (:Link …) requires url")
            from .model import LINK_SCHEMA

            df = store.spark.createDataFrame(
                [
                    tuple(
                        None if row[c] is None else str(row[c])
                        for c in LINK_COLUMNS
                    )
                ],
                LINK_SCHEMA,
            )
            if set_cols:
                store.merge_set_links(df, tuple(set_cols))
            else:
                store.merge_links(df, update=False)
        else:
            if assigns:
                # SET on Category/Keyword could only target `name`,
                # which is the primary key — a rekey, not an update
                raise CypherSyntaxError(
                    f"SET is not supported on :{label} (name is the key)"
                )
            name = n.props.get("name")
            if name is None:
                raise CypherSyntaxError(f"MERGE (:{label} …) requires name")
            df = store.spark.createDataFrame([(name,)], ["name"])
            store.merge_names(_LABEL_TABLE[label], df)
        return

    p.expect_kw("MATCH")
    nodes, hops, _groups = p.patterns()
    if hops:
        raise CypherSyntaxError("write MATCH patterns must be bare nodes")
    by_var = {n.var: n for n in nodes}

    if p.take_kw("WHERE"):
        # the notebook's orphan cleanup (Edits.ipynb c12):
        #   MATCH (c:Category) WHERE NOT (c)<-[:BELONGS_TO]-() DELETE c
        #   MATCH (k:Keyword)  WHERE NOT (k)<-[:HAS_KEYWORD]-() DELETE k
        p.expect_kw("NOT")
        inner = p.node()
        bm = p.take(_REL_BWD)
        if not bm:
            raise CypherSyntaxError(
                "only the no-incoming-edge orphan pattern is supported in "
                "write WHERE: NOT (v)<-[:REL]-()"
            )
        rel = bm.group(1)
        p.node()  # the anonymous () source
        p.expect_kw("DELETE")
        v = p.expect(_IDENT, "variable").group(0)
        if not p.at_end():
            raise CypherSyntaxError("trailing input after orphan DELETE")
        if inner.var != v or v not in by_var:
            raise CypherSyntaxError("orphan DELETE must target the matched node")
        label = by_var[v].label
        expected_rel = {"Category": "BELONGS_TO", "Keyword": "HAS_KEYWORD"}.get(
            label or ""
        )
        if rel != expected_rel:
            raise CypherSyntaxError(
                f"orphan pattern for :{label} must use [:{expected_rel}]"
            )
        store.cleanup_orphans(only=_LABEL_TABLE[label])
        return

    if p.take_kw("MERGE"):
        # (a)-[:REL]->(b)
        mnodes, mhops = p.chain()
        if len(mhops) != 1 or not p.at_end():
            raise CypherSyntaxError("MERGE supports exactly one relationship hop")
        h = mhops[0]
        src, dst = (h.src_var, h.dst_var) if h.forward else (h.dst_var, h.src_var)
        for v in (src, dst):
            if v not in by_var:
                raise CypherSyntaxError(f"MERGE references unmatched variable {v!r}")
        src_key = by_var[src].props.get("url")
        dst_key = by_var[dst].props.get("name")
        if src_key is None or dst_key is None:
            raise CypherSyntaxError(
                "relationship MERGE needs {url: …} / {name: …} matches"
            )
        et = _REL_TABLE[h.rel]
        dst_col = "dst_category" if et == "belongs_to" else "dst_keyword"
        df = store.spark.createDataFrame([(src_key, dst_key)], ["src_url", dst_col])
        store.merge_edges(et, df)
        return

    if p.take_kw("DETACH"):
        p.expect_kw("DELETE")
        v = p.expect(_IDENT, "variable").group(0)
        if v not in by_var:
            raise CypherSyntaxError(f"DETACH DELETE references unmatched {v!r}")
        url = by_var[v].props.get("url")
        if url is None:
            raise CypherSyntaxError("DETACH DELETE needs a {url: …} point match")
        if not p.at_end():
            raise CypherSyntaxError("trailing input after DETACH DELETE")
        store.detach_delete_link(url)
        return

    raise CypherSyntaxError("expected MERGE or DETACH DELETE after MATCH")
