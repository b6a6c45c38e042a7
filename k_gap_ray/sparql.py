"""SPARQL SELECT subset (S3) executed natively on Ray Data quads.

The reference's interactive surface is SPARQL SELECT against GraphDB
(`/root/reference/jupyter/kgap/notebooks/kgap_tools.py:22-31`; query
templates under `docs/components/graphdb.md`). This module plays that
role Ray-Data-first: :func:`parse_sparql` parses a practical SPARQL
subset, :func:`sparql_select` compiles it to a Dataset plan over a
quads table (one filtered scan per triple pattern, hash joins on the
shared variables, vectorized FILTER masks), and :func:`sparql_to_sql`
compiles the SAME parsed query to ANSI SQL — the independent oracle
backend for the driver gate and the cross-check tests.

Supported subset (documented; out-of-subset input raises ValueError):

- ``PREFIX pfx: <iri>`` declarations; terms ``?var``, ``<iri>``,
  ``pfx:local``, ``"string"``, bare numbers, typed literals
  ``"lex"^^dt``. A bare number or a numeric-xsd typed literal on
  either side of a FILTER comparison makes it NUMERIC: variable
  values coerce string→double with non-numeric values nulled (the
  Arrow mirror of SQL ``TRY_CAST``; a null comparison drops the
  row on both backends). Non-numeric datatypes (xsd:dateTime,
  xsd:date, xsd:gYear, …) compare as strings — correct for
  ISO-8601/zero-padded lexical forms.
- ``SELECT [DISTINCT] ?a ?b | *`` over ``WHERE { tp . tp . FILTER }``
  basic graph patterns. Matching is over the quad table's rows (the
  union of named graphs); use DISTINCT for set-semantics results.
- ``OPTIONAL { tp . FILTER }`` groups (each left-joined to the
  required part on their shared variables; unmatched rows null-fill).
- ``{ bgp } UNION { bgp } [UNION ...]`` as the WHERE body (bag union,
  == SQL UNION ALL; every branch must bind the same variable set;
  use DISTINCT for set semantics). Branches are plain BGPs+FILTERs.
- ``FILTER NOT EXISTS { tp . FILTER }`` anti-join groups (correlated
  on the shared variables; applied after OPTIONAL joins, like the
  other top-level filters — identically on both backends).
- One ``(COUNT|MIN|MAX|SUM|AVG|GROUP_CONCAT(?x) AS ?n)`` aggregate
  with ``GROUP BY`` (or global), plus ``COUNT(DISTINCT ?x)`` (the
  reference's idiom, docs/components/sembench.md:242 — must be the
  only aggregate, like GROUP_CONCAT); ?x must be a required-group
  variable (so COUNT == row count and the others never see nulls,
  identically on both backends). MIN/MAX compare strings (the quad
  object column's type); SUM/AVG coerce values numerically with the
  TRY_CAST-mirror rule (non-numeric → skipped on both backends;
  integer inputs keep SUM exact and AVG bit-identical);
  GROUP_CONCAT concatenates the group's values in SORTED order
  (SPARQL leaves it undefined — sorting makes both backends
  deterministic) with an optional ``; SEPARATOR="s"``; SAMPLE is
  pinned to MIN (same determinism argument).
- ``FILTER`` expressions: ``= != < <= > >=`` comparisons between
  variables and literals (string collation, or numeric per the rule
  above), ``STRSTARTS(?v, "s")``, ``STRENDS(?v, "s")``,
  ``CONTAINS(?v, "s")``,
  ``REGEX(?v, "re")`` (RE2-compatible patterns — both Arrow and
  DuckDB use RE2-family engines), ``BOUND(?v)`` (true for matched
  OPTIONAL rows), ``LANG(?v) = "tag"`` (?v must be bound at the
  object position of exactly one non-path pattern; its scan also
  projects ``obj_lang``), ``STRLEN(?v) op n`` (codepoint length on
  both backends), ``!expr``, ``&&``, ``||``, parentheses.
- Term inspection under the same single-binder rule as LANG():
  ``isLiteral(?v)`` / ``isIRI(?v)`` / ``isURI(?v)`` (the quads'
  ``obj_is_literal`` metadata column — this engine's quads carry no
  blank nodes, so isIRI is its exact negation) and
  ``DATATYPE(?v) =|!= <iri>`` (the ``obj_datatype`` column; what a
  non-typed object stores — ``''`` in the docs-KG quads — is the
  data model's choice and identical on both backends).
  A comparison operand may be ONE additive expression ``term (+|-|*)
  term`` (vars or numeric literals, at least one var) — e.g.
  ``FILTER(?a > ?b + 5)``; it forces the comparison numeric and runs
  in DOUBLE on both backends (IEEE + - * are deterministic, and the
  TRY_CAST-mirror coercions match).
- Negated property sets ``!<iri>`` / ``!(p1|p2|...)`` in the
  predicate position (constant IRIs; scans pred NOT IN set; composes
  with ``^`` and ``/`` but not with ``+``/``*``/``?`` modifiers).
- ``?v [NOT] IN (const, const, ...)`` membership filters (compiled
  like single-var VALUES; a null input — unmatched optional var —
  yields null and drops the row on both backends, so NOT IN is
  SQL-exact).
- Aggregate subqueries as WHERE elements: ``{ SELECT ?g (AGG(?x) AS
  ?a) WHERE { ... } GROUP BY ?g }`` inner-joins the outer group on
  the shared GROUP BY variables and binds the aliases as new
  (never-null) variables; a WHERE body may also be subqueries only
  (aggregate-of-aggregates). One nesting level; no ORDER/LIMIT inside
  a subquery; aliases must not rebind outer variables.
- ``a`` in the predicate position (the rdf:type shorthand; composes
  with paths).
- Property paths in the predicate position: ``^step`` (inverse),
  ``step/step/...`` (sequence — desugared to extra patterns over
  reserved ``__pp{n}`` hop variables, hidden from ``SELECT *``),
  ``(p1|p2|...)`` (alternative set — scans pred ∈ set), and
  ``<iri>+`` / ``(p1|p2)+`` (one-or-more — the transitive closure of
  the predicate(s)' edge set, computed semi-naively in Dataset ops on
  the Ray backend and by a recursive CTE on the SQL backend),
  ``<iri>*`` (zero-or-more: the closure seeded with the zero-hop
  identity over the graph's node set — all distinct subjects and
  objects, graph-scoped under GRAPH) and ``<iri>?`` (zero-or-one:
  identity ∪ the single-hop edges; set semantics like all path
  relations). ``+``/``*``/``?`` and ``|`` need constant IRIs;
  ``^``/``/`` compose with variable predicates too.
- ``BIND(CONCAT(arg, ...) AS ?v)`` / ``BIND(term AS ?v)`` computed
  columns (M4), applied after the required group; argument variables
  must be required-group vars (never null, so Arrow's
  binary_join_element_wise and SQL ``||`` agree exactly) or targets
  of an EARLIER BIND in the same group. Bound vars are selectable,
  filterable, groupable and usable in CONSTRUCT.
- String-function BINDs over the same argument rule:
  ``UCASE``/``LCASE`` (Arrow utf8_upper/lower == SQL upper/lower,
  incl. non-ASCII), ``SUBSTR(?v, start[, len])`` with positive
  integer-literal start/len (Arrow utf8_slice_codeunits slices by
  CODEPOINTS, matching 1-based character-counted SQL substr),
  ``REPLACE(?v, "re", "rep")`` (global RE2 replace on both engines),
  and ``STRBEFORE``/``STRAFTER(?v, "delim")`` with a non-empty
  literal delimiter (both return ``""`` when the delimiter does not
  occur, per SPARQL — mirrored with a strpos CASE in SQL).
- Numeric BINDs: ``BIND(?a + ?b AS ?v)`` (also ``-``, ``*``) — ONE
  binary operation (no precedence chains) over the exact INTEGER
  coercion (integer-lexical regexp guard, then BIGINT/int64; a
  non-integer lexical nulls the operand and the result on both
  backends) — and ``ABS`` (integer domain) / ``CEIL`` / ``FLOOR`` /
  ``ROUND`` (double coercion, half-away-from-zero rounding, integral
  result). Results are bound as the canonical integer STRING, so the
  new var composes with every other string-var feature (FILTER,
  GROUP BY, CONCAT, ORDER BY needs the numeric filter rule).
- ``BIND(COALESCE(a, b, ...) AS ?v)``: like IF, applied AFTER the
  OPTIONAL joins on both backends (SQL ``COALESCE``), so its whole
  point — picking the first bound optional var — works.
- ``BIND(IF(cond, then, else) AS ?v)``: cond is a full FILTER
  expression, typically ``!BOUND(?opt)``; applied AFTER the OPTIONAL
  joins on both backends (SQL ``CASE WHEN``), so then/else/cond may
  reference optional vars; a null condition selects ``else``.
- ``GRAPH term { tp . tp . FILTER }`` (top-level WHERE element):
  scopes each contained pattern to a named graph — a constant IRI
  filters the quad scan's ``graph`` column, a variable BINDS it (and
  joins across patterns sharing it, giving same-graph semantics);
  filters inside the block are conjunctive with the top level. A
  ``+`` path under GRAPH needs a constant graph IRI (the closure is
  then computed over that graph's edge set only).
- ``VALUES ?x { v v ... }`` single-variable inline data (top-level
  WHERE element; compiled to a membership mask / SQL ``IN`` list on
  an already-bound variable).
- ``ORDER BY [ASC(?v)|DESC(?v)|?v]``, ``LIMIT n``, ``OFFSET m``
  (offset applied at the driver edge on the sorted head, as in
  relational.q_sort_limit_offset).
- ``CONSTRUCT { tp . tp . } WHERE { ... }`` (:func:`sparql_construct`
  / :func:`sparql_construct_to_sql`): instantiate each template per
  solution, drop instantiations with unbound OPTIONAL vars, return
  the DISTINCT triple set — the M6 vocabulary-remap operator as a
  query; no solution modifiers.
- ``DESCRIBE <iri> ... [?v ...] [WHERE { ... }]``
  (:func:`sparql_describe` / :func:`sparql_describe_to_sql`): the
  DISTINCT triples whose subject — or non-literal object — is in the
  resource set (constants + the WHERE bindings of each DESCRIBE
  variable); a symmetric description without blank-node closure,
  pinned because the spec leaves the shape implementation-defined.
  Completes the four query forms the reference's endpoint serves.

Scale notes: every triple pattern is an independent pruned scan of the
(materialized-once) quads Dataset; patterns sharing one variable join
via a hash join on that column, multi-variable joins go through one
composite key column. No cartesian products (raises). Skewed join
variables (e.g. a hub entity) inherit the hash-join partitioning —
salt upstream if a pattern variable is known-hot.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

_SEP = "\x1f"  # composite join key separator (same caveat as dedup_quads)
_INTERNAL = "__pp"  # reserved prefix: path-hop vars, hidden from SELECT *
_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"  # `a`
_XSD = "http://www.w3.org/2001/XMLSchema#"
# xsd datatypes whose typed literals compare NUMERICALLY in FILTER
# (everything else — dateTime, date, gYear, string… — compares as the
# lexical string; ISO-8601/zero-padded forms order correctly that way)
_NUM_DATATYPES = frozenset(_XSD + n for n in (
    "integer", "decimal", "double", "float", "long", "int", "short",
    "byte", "nonNegativeInteger", "positiveInteger", "negativeInteger",
    "nonPositiveInteger", "unsignedLong", "unsignedInt", "unsignedShort",
    "unsignedByte"))
# numeric-literal grammar for string->double coercion: kept in sync
# with what DuckDB's TRY_CAST(... AS DOUBLE) accepts for the values
# this engine stores (plain ints/decimals/scientific; no inf/nan)
_NUM_RE = r"^[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$"
# BIND string functions: name -> (min arity, max arity). Arrow and
# DuckDB agree exactly on each (verified: utf8_slice_codeunits slices
# by CODEPOINTS like SQL substr; both regex engines are RE2; upper/
# lower match on non-ASCII).
_STRFNS = {"UCASE": (1, 1), "LCASE": (1, 1), "SUBSTR": (2, 3),
           "REPLACE": (3, 3), "STRBEFORE": (2, 2), "STRAFTER": (2, 2)}
# numeric BIND surface: binary + - * over the INTEGER coercion, and
# ABS (integer) / CEIL / FLOOR / ROUND (double coercion, integral
# result). Results render as the canonical integer string so bound
# vars stay inside the engine's all-string variable model; int64
# arithmetic is exact and order-independent on both backends.
_NUMFNS = ("ABS", "CEIL", "FLOOR", "ROUND")
# integer-literal grammar for the exact string->int64 coercion; the
# SQL mirror regexp-guards the same way because DuckDB's bare
# TRY_CAST(... AS BIGINT) ROUNDS decimal lexicals ('4.5' -> 5)
# instead of nulling them (measured, BENCH/NOTES.md round 4)
_INT_RE = r"^[+-]?\d+$"


def _check_numbind(op: str, args: list) -> None:
    """Numeric BIND operand rule: vars or numeric literals only, at
    least one variable (all-constant folds are pointless and would
    need scalar->array broadcast), and integer-domain ops (+ - * ABS)
    take integer literals only — a decimal there would silently null
    on both backends, better rejected at parse."""
    if not any(a.kind == "var" for a in args):
        raise ValueError(f"{op} BIND needs at least one variable operand")
    for a in args:
        if a.kind not in ("var", "num"):
            raise ValueError(f"{op} BIND operands must be variables "
                             "or numeric literals")
        if a.kind == "num" and op not in ("CEIL", "FLOOR", "ROUND") \
                and not re.match(_INT_RE, a.value):
            raise ValueError(
                f"{op} BIND literal operand must be an integer "
                "(integer-domain arithmetic; decimal literals only "
                "under CEIL/FLOOR/ROUND)")


def _check_strfn(fname: str, args: list) -> None:
    lo, hi = _STRFNS[fname]
    if not (lo <= len(args) <= hi):
        raise ValueError(f"{fname} takes {lo}..{hi} arguments")
    if fname == "SUBSTR":
        for a in args[1:]:
            if a.kind != "num" or not a.value.isdigit() \
                    or int(a.value) < (1 if a is args[1] else 0):
                raise ValueError(
                    "SUBSTR start/length must be non-negative integer "
                    "literals (start >= 1; dynamic args out of subset)")
    elif fname == "REPLACE":
        if any(a.kind != "lit" for a in args[1:]):
            raise ValueError(
                "REPLACE pattern/replacement must be string literals")
    elif fname in ("STRBEFORE", "STRAFTER"):
        if args[1].kind != "lit" or not args[1].value:
            raise ValueError(
                f"{fname} delimiter must be a non-empty string literal "
                "(the empty-delimiter edge diverges between backends)")



@dataclass(frozen=True)
class Term:
    kind: str  # 'var' | 'iri' | 'lit'
    value: str


@dataclass(frozen=True)
class Pattern:
    s: Term
    p: Term
    o: Term
    g: Term | None = None  # GRAPH scope (None = any graph)

    def vars(self) -> list[str]:
        out = []
        for _, t in self.terms():
            if t.kind == "var" and t.value not in out:
                out.append(t.value)
        return out

    def terms(self):
        base = [("s", self.s), ("p", self.p), ("o", self.o)]
        if self.g is not None:
            base.append(("g", self.g))
        return base

    def positions(self):
        """(term, quad column) pairs actually constrained by this
        pattern — the scan/compile contract for both backends."""
        cols = [(self.s, "subj"), (self.p, "pred"), (self.o, "obj")]
        if self.g is not None:
            cols.append((self.g, "graph"))
        return cols


@dataclass
class SparqlQuery:
    select_vars: list[str] | None  # None = *
    distinct: bool = False
    patterns: list[Pattern] = field(default_factory=list)
    filters: list[tuple] = field(default_factory=list)
    # BIND(expr AS ?v) computed columns, applied after the required
    # group: expr = ('concat', [Term...]) | ('term', Term); argument
    # variables must be required-group vars (never null on both
    # backends, so || and binary_join_element_wise agree)
    binds: list[tuple[str, tuple]] = field(default_factory=list)
    # OPTIONAL groups, each left-joined to the required part in order
    optionals: list[tuple[list[Pattern], list[tuple]]] = \
        field(default_factory=list)
    # UNION branches (when non-empty, `patterns`/`optionals` are empty)
    unions: list[tuple[list[Pattern], list[tuple]]] = \
        field(default_factory=list)
    # FILTER NOT EXISTS groups (anti-joined on their shared variables)
    not_exists: list[tuple[list[Pattern], list[tuple]]] = \
        field(default_factory=list)
    # MINUS groups: same dedup-to-shared-vars anti-join (our NOT
    # EXISTS plan IS the MINUS-compatible one), except a group sharing
    # NO variable removes nothing (SPARQL spec) instead of erroring
    minus: list[tuple[list[Pattern], list[tuple]]] = \
        field(default_factory=list)
    # FILTER EXISTS groups (semi-joined on their shared variables)
    exists: list[tuple[list[Pattern], list[tuple]]] = \
        field(default_factory=list)
    # CONSTRUCT template (when non-empty this is a CONSTRUCT query:
    # select_vars/agg/order/limit are unused; result = DISTINCT triples)
    construct: list[Pattern] = field(default_factory=list)
    # aggregates: (fn, var, alias) per SELECT item;
    # fn ∈ COUNT|MIN|MAX|SUM|AVG|GROUP_CONCAT — any number of the
    # first five combine in one grouped pass; GROUP_CONCAT (the
    # map_groups path) must be the only aggregate
    aggs: list[tuple[str, str, str]] = field(default_factory=list)
    agg_sep: str = " "  # GROUP_CONCAT separator
    group_by: list[str] = field(default_factory=list)
    # HAVING expressions, applied after the grouped aggregation;
    # each comparison needs a numeric literal on one side (aggregate
    # aliases compare numerically on both backends)
    having: list[tuple] = field(default_factory=list)
    # variables whose LANG(...) is referenced by any filter/bind: their
    # object-position scan also projects obj_lang as __pplang_{var}
    lang_vars: set = field(default_factory=set)
    # same single-binder contract for isLiteral/isIRI (projects
    # obj_is_literal as __pplit_{var}) and DATATYPE (obj_datatype as
    # __ppdt_{var})
    lit_vars: set = field(default_factory=set)
    dt_vars: set = field(default_factory=set)

    def meta_specs(self) -> frozenset:
        """(kind, var) pairs for every term-metadata projection the
        query needs from its binding scans (kind ∈ _META_KINDS)."""
        return frozenset(
            {("lang", v) for v in self.lang_vars}
            | {("lit", v) for v in self.lit_vars}
            | {("dt", v) for v in self.dt_vars})
    order_by: list[tuple[str, bool]] = field(default_factory=list)
    limit: int | None = None
    offset: int = 0
    # ASK form: result is a single boolean (any solution exists?)
    ask: bool = False
    # DESCRIBE form: resources to describe — constant IRIs and/or
    # variables bound by the WHERE body; result = DISTINCT triples
    # where a described resource is the subject, or the non-literal
    # object (symmetric description, the GraphDB-family default shape)
    describe: list[Term] = field(default_factory=list)
    # aggregate subqueries ({ SELECT ?g (AGG(?x) AS ?a) WHERE {...}
    # GROUP BY ?g } as a WHERE element), inner-joined to the outer
    # group on the shared GROUP BY variables
    subqueries: list = field(default_factory=list)


def _expr_vars(e: tuple) -> set:
    """All variable names referenced by a filter expression."""
    tag = e[0]
    if tag in ("or", "and"):
        return _expr_vars(e[1]) | _expr_vars(e[2])
    if tag == "not":
        return _expr_vars(e[1])
    if tag in ("in", "bound", "isliteral"):
        return {e[1]}
    if tag == "fn":
        return {e[2]}
    out = set()  # cmp: operands are Terms, (lang|strlen|dt, var)
    for x in (e[2], e[3]):  # tuples, or ("arithx", op, t1, t2)
        if isinstance(x, tuple):
            if x[0] == "arithx":
                out |= {y.value for y in (x[2], x[3])
                        if y.kind == "var"}
            else:
                out.add(x[1])
        elif x.kind == "var":
            out.add(x.value)
    return out


def _expr_meta_vars(e: tuple, kind: str) -> set:
    """Vars whose `kind` metadata (lang/lit/dt) a filter expression
    references — LANG(?v)/DATATYPE(?v) comparison sides and
    isLiteral/isIRI(?v) primaries."""
    tag = e[0]
    if tag in ("or", "and"):
        return _expr_meta_vars(e[1], kind) | _expr_meta_vars(e[2], kind)
    if tag == "not":
        return _expr_meta_vars(e[1], kind)
    if tag == "isliteral":
        return {e[1]} if kind == "lit" else set()
    if tag == "cmp":
        return {x[1] for x in (e[2], e[3])
                if isinstance(x, tuple) and x[0] == kind}
    return set()


def _lang_col(var: str) -> str:
    """Internal column carrying obj_lang for a LANG()-referenced var
    (the _INTERNAL prefix keeps it out of SELECT * on both backends)."""
    return f"{_INTERNAL}lang_{var}"


def _lit_col(var: str) -> str:
    return f"{_INTERNAL}lit_{var}"


def _dt_col(var: str) -> str:
    return f"{_INTERNAL}dt_{var}"


#: term-metadata kinds: expression key -> (internal column namer, the
#: quads source column a binding scan projects it from)
_META_KINDS = {"lang": (_lang_col, "obj_lang"),
               "lit": (_lit_col, "obj_is_literal"),
               "dt": (_dt_col, "obj_datatype")}


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""\s+|\#[^\n]*
      |(?P<iri><[^<>\s]*>)
      |(?P<var>\?[A-Za-z_][A-Za-z0-9_]*)
      |(?P<str>"(?:[^"\\]|\\.)*")
      |(?P<num>-?\d+(\.\d+)?)
      |(?P<pname>[A-Za-z_][A-Za-z0-9_-]*:[A-Za-z0-9_.-]*)
      |(?P<kw>[A-Za-z_][A-Za-z0-9_]*)
      |(?P<op>&&|\|\||!=|<=|>=|\^\^|[=<>{}().,;*/+^|!?-])
    """,
    re.X,
)


def _tokenize(q: str) -> list[tuple[str, str]]:
    toks, pos = [], 0
    while pos < len(q):
        m = _TOKEN_RE.match(q, pos)
        if m is None:
            raise ValueError(f"SPARQL lex error at {q[pos:pos + 20]!r}")
        pos = m.end()
        for name in ("iri", "var", "str", "num", "pname", "kw", "op"):
            v = m.group(name)
            if v is not None:
                toks.append((name, v))
                break
    return toks


class _P:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.fresh = 0  # fresh internal-variable counter (path hops)

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i] if self.i < len(self.toks) else ("", "")

    def peek2(self) -> tuple[str, str]:
        j = self.i + 1
        return self.toks[j] if j < len(self.toks) else ("", "")

    def next(self) -> tuple[str, str]:
        t = self.peek()
        self.i += 1
        return t

    def kw(self, word: str) -> bool:
        k, v = self.peek()
        if k == "kw" and v.upper() == word:
            self.i += 1
            return True
        return False

    def expect_op(self, op: str) -> None:
        k, v = self.next()
        if k != "op" or v != op:
            raise ValueError(f"expected {op!r}, got {v!r}")

    def term(self) -> Term:
        k, v = self.next()
        if k == "var":
            return Term("var", v[1:])
        if k == "iri":
            return Term("iri", v[1:-1])
        if k == "pname":
            pfx, _, local = v.partition(":")
            if pfx not in self.prefixes:
                raise ValueError(f"undeclared prefix {pfx!r}")
            return Term("iri", self.prefixes[pfx] + local)
        if k == "str":
            val = re.sub(r"\\(.)", r"\1", v[1:-1])
            if self.peek() == ("op", "^^"):  # typed literal "..."^^dt
                self.next()
                dt = self.term()
                if dt.kind != "iri":
                    raise ValueError("^^ needs an IRI datatype")
                # numeric xsd types compare numerically; every other
                # datatype keeps string comparison (ISO-8601 forms
                # order correctly lexicographically)
                return Term("num" if dt.value in _NUM_DATATYPES
                            else "lit", val)
            return Term("lit", val)
        if k == "num":
            return Term("num", v)
        raise ValueError(f"bad term {v!r}")

    def triple_patterns(self) -> list[Pattern]:
        """One `subject path object` statement, desugared to patterns.

        Property-path subset: ``^step`` (inverse), ``step/step/...``
        (sequence), ``<iri>+`` (one-or-more; kept as a Term of kind
        ``path+`` and closed transitively at execution time on both
        backends). Sequence hops bind fresh internal ``__pp{n}``
        variables (reserved prefix; excluded from ``SELECT *``)."""
        s = self.term()
        steps: list[tuple[bool, Term]] = []
        while True:
            inv = self.peek() == ("op", "^")
            if inv:
                self.next()
            if self.peek() == ("op", "!"):
                # negated property set !<iri> | !(p1|p2|...): scans
                # pred NOT IN set (forward properties only; ^-inside
                # and path modifiers on the set are out of subset)
                self.next()
                if self.peek() == ("op", "("):
                    self.next()
                    nalts = [self.term()]
                    while self.peek() == ("op", "|"):
                        self.next()
                        nalts.append(self.term())
                    self.expect_op(")")
                elif self.peek() == ("kw", "a"):
                    self.next()
                    nalts = [Term("iri", _RDF_TYPE)]
                else:
                    nalts = [self.term()]
                if any(a.kind != "iri" for a in nalts):
                    raise ValueError(
                        "negated property set needs constant IRIs")
                t = Term("nalt", _SEP.join(a.value for a in nalts))
            elif self.peek() == ("op", "("):
                # alternative set (p1|p2|...): scans pred ∈ set; with
                # +, the closure runs over the UNION edge set
                self.next()
                alts = [self.term()]
                while self.peek() == ("op", "|"):
                    self.next()
                    alts.append(self.term())
                self.expect_op(")")
                if any(a.kind != "iri" for a in alts):
                    raise ValueError(
                        "path alternatives must be constant IRIs")
                t = Term("alt", _SEP.join(a.value for a in alts))
            elif self.peek() == ("kw", "a"):  # rdf:type shorthand
                self.next()
                t = Term("iri", _RDF_TYPE)
            else:
                t = self.term()
                if t.kind in ("lit", "num"):
                    raise ValueError("literal in predicate position")
            nk, nv = self.peek()
            if nk == "op" and nv in ("+", "*", "?"):
                # one-or-more / zero-or-more / zero-or-one path
                # modifier; */? add the zero-hop identity over the
                # graph's node set (all subjects and objects)
                if t.kind not in ("iri", "alt"):
                    raise ValueError(
                        f"{nv!r} needs constant IRI predicate(s)")
                self.next()
                t = Term("path" + nv, t.value)
            steps.append((inv, t))
            if self.peek() == ("op", "/"):
                self.next()
                continue
            break
        o = self.term()
        pats, cur = [], s
        for i, (inv, t) in enumerate(steps):
            if i == len(steps) - 1:
                nxt = o
            else:
                nxt = Term("var", f"{_INTERNAL}{self.fresh}")
                self.fresh += 1
            pats.append(Pattern(nxt, t, cur) if inv else Pattern(cur, t, nxt))
            cur = nxt
        return pats

    # FILTER expression: or > and > primary
    def expr(self) -> tuple:
        e = self.expr_and()
        while self.peek() == ("op", "||"):
            self.next()
            e = ("or", e, self.expr_and())
        return e

    def expr_and(self) -> tuple:
        e = self.expr_prim()
        while self.peek() == ("op", "&&"):
            self.next()
            e = ("and", e, self.expr_prim())
        return e

    def _fn_var_arg(self, name: str) -> str:
        self.next()
        self.expect_op("(")
        var = self.term()
        if var.kind != "var":
            raise ValueError(f"{name} needs a variable argument")
        self.expect_op(")")
        return var.value

    def _maybe_arith(self, t1):
        """Optional additive suffix on a comparison operand:
        ``term (+|-|*) term`` (one operation; operands are variables
        or numeric literals, at least one variable). Forces the
        comparison NUMERIC — computed in DOUBLE on both backends
        (IEEE + - * are deterministic, and the coercions mirror)."""
        nk, nv = self.peek()
        if nk != "op" or nv not in ("+", "-", "*"):
            return t1
        self.next()
        t2 = self.term()
        for t_ in (t1, t2):
            if not isinstance(t_, tuple) and t_.kind not in ("var",
                                                             "num"):
                raise ValueError(
                    "FILTER arithmetic operands must be variables or "
                    "numeric literals")
        if isinstance(t1, tuple) or not (
                t1.kind == "var" or t2.kind == "var"):
            raise ValueError(
                "FILTER arithmetic needs at least one variable and "
                "no nested function operands")
        return ("arithx", nv, t1, t2)

    def expr_prim(self) -> tuple:
        k, v = self.peek()
        if (k, v) == ("op", "("):
            self.next()
            e = self.expr()
            self.expect_op(")")
            return e
        if (k, v) == ("op", "!"):  # logical negation (e.g. !BOUND(?x))
            self.next()
            return ("not", self.expr_prim())
        if k == "kw" and v.upper() == "BOUND":
            return ("bound", self._fn_var_arg("BOUND"))
        if k == "kw" and v.upper() in ("ISLITERAL", "ISIRI", "ISURI"):
            # term-inspection primaries over the quads' metadata
            # column (obj_is_literal); isIRI/isURI is its negation —
            # this engine's quads have no blank nodes
            name = v.upper()
            var = self._fn_var_arg(name)
            e = ("isliteral", var)
            return e if name == "ISLITERAL" else ("not", e)
        if k == "kw" and v.upper() in ("LANG", "STRLEN", "DATATYPE"):
            # metadata-/numeric-valued functions usable as a comparison
            # LHS: LANG(?v) op "tag" | STRLEN(?v) op number |
            # DATATYPE(?v) =/!= <iri>
            name = v.upper()
            tagname = {"LANG": "lang", "STRLEN": "strlen",
                       "DATATYPE": "dt"}[name]
            left = (tagname, self._fn_var_arg(name))
            ok, ov = self.next()
            if ok != "op" or ov not in ("=", "!=", "<", "<=", ">", ">="):
                raise ValueError(f"{name} needs a comparison, got {ov!r}")
            right = self.term()
            if name == "LANG" and right.kind != "lit":
                raise ValueError("LANG compares against a string literal")
            if name == "STRLEN" and right.kind != "num":
                raise ValueError("STRLEN compares against a number")
            if name == "DATATYPE" and (right.kind != "iri"
                                       or ov not in ("=", "!=")):
                raise ValueError(
                    "DATATYPE compares =/!= against a datatype IRI")
            return ("cmp", ov, left, right)
        if k == "kw" and v.upper() in ("STRSTARTS", "STRENDS",
                                       "CONTAINS", "REGEX"):
            name = v.upper()
            self.next()
            self.expect_op("(")
            var = self.term()
            if var.kind != "var":
                raise ValueError(f"{name} needs a variable first arg")
            self.expect_op(",")
            lit = self.term()
            if lit.kind != "lit":
                raise ValueError(f"{name} needs a literal second arg")
            self.expect_op(")")
            return ("fn", name, var.value, lit.value)
        left = self._maybe_arith(self.term())
        nk, nv = self.peek()
        if nk == "kw" and nv.upper() in ("IN", "NOT"):
            if isinstance(left, tuple):
                raise ValueError("IN needs a variable on the left")
            # FILTER (?x [NOT] IN (v, v, ...)) — same membership mask
            # as single-var VALUES / SQL IN on both backends
            if left.kind != "var":
                raise ValueError("IN needs a variable on the left")
            negate = nv.upper() == "NOT"
            self.next()
            if negate and not self.kw("IN"):
                raise ValueError("expected IN after NOT")
            self.expect_op("(")
            vals = []
            while True:
                t_ = self.term()
                if t_.kind == "var":
                    raise ValueError("IN list takes constants only")
                vals.append(t_.value)
                if self.peek() == ("op", ","):
                    self.next()
                    continue
                break
            self.expect_op(")")
            e = ("in", left.value, vals)
            return ("not", e) if negate else e
        ok, ov = self.next()
        if ok != "op" or ov not in ("=", "!=", "<", "<=", ">", ">="):
            raise ValueError(f"bad comparison operator {ov!r}")
        right = self._maybe_arith(self.term())
        return ("cmp", ov, left, right)


def parse_sparql(query: str) -> SparqlQuery:
    p = _P(_tokenize(query))
    while p.kw("PREFIX"):
        k, v = p.next()
        if k != "pname":
            raise ValueError(f"bad PREFIX name {v!r}")
        pfx = v[: v.index(":")]
        ik, iv = p.next()
        if ik != "iri":
            raise ValueError("PREFIX needs an <iri>")
        p.prefixes[pfx] = iv[1:-1]
    if p.kw("CONSTRUCT"):
        q = SparqlQuery(select_vars=None)
        p.expect_op("{")
        while p.peek() != ("op", "}"):
            s = p.term()
            if p.peek() == ("kw", "a"):  # rdf:type shorthand, here too
                p.next()
                pr = Term("iri", _RDF_TYPE)
            else:
                pr = p.term()
            q.construct.append(Pattern(s, pr, p.term()))
            if p.peek() == ("op", "."):
                p.next()
        p.next()  # }
        if not q.construct:
            raise ValueError("CONSTRUCT needs at least one template "
                             "triple")
        return _parse_where_and_modifiers(p, q)
    if p.kw("ASK"):
        q = SparqlQuery(select_vars=None)
        q.ask = True
        return _parse_where_and_modifiers(p, q)
    if p.kw("DESCRIBE"):
        q = SparqlQuery(select_vars=[])
        while p.peek()[0] in ("iri", "pname", "var"):
            q.describe.append(p.term())
        if not q.describe:
            raise ValueError("DESCRIBE needs at least one IRI or "
                             "variable")
        if any(t.kind == "var" for t in q.describe):
            return _parse_where_and_modifiers(p, q)
        if p.peek()[0] != "":
            raise ValueError("constant DESCRIBE takes no WHERE or "
                             "modifiers in this subset")
        return q
    if not p.kw("SELECT"):
        raise ValueError("only SELECT/ASK/CONSTRUCT/DESCRIBE queries "
                         "are supported")
    q = _parse_select_clause(p)
    return _parse_where_and_modifiers(p, q)


def _parse_select_clause(p: _P) -> SparqlQuery:
    """Parse ``[DISTINCT] (?v ... | * | (AGG(?x) AS ?a) ...)`` — the
    SELECT item list shared by top-level queries and aggregate
    subqueries (SELECT itself already consumed)."""
    q = SparqlQuery(select_vars=None)
    q.distinct = p.kw("DISTINCT")
    if p.peek() == ("op", "*"):
        p.next()
    else:
        vs = []
        while True:
            k, v = p.peek()
            if k == "var":
                vs.append(p.next()[1][1:])
            elif (k, v) == ("op", "("):
                # (COUNT|MIN|MAX|SUM|AVG|GROUP_CONCAT(?x) AS ?alias);
                # GROUP_CONCAT takes an optional `; SEPARATOR="s"` and
                # concatenates the group's values in SORTED order on
                # both backends (deterministic; SPARQL leaves the
                # order undefined)
                p.next()
                fk, fv = p.next()
                aggs = ("COUNT", "MIN", "MAX", "SUM", "AVG",
                        "GROUP_CONCAT", "SAMPLE")
                if fk != "kw" or fv.upper() not in aggs:
                    raise ValueError(
                        f"only {'/'.join(aggs)} aggregates are supported")
                p.expect_op("(")
                fn_name = fv.upper()
                if p.kw("DISTINCT"):
                    # COUNT(DISTINCT ?x) — the reference's idiom
                    # (docs/components/sembench.md:242); other
                    # aggregates don't take DISTINCT in this subset
                    if fn_name != "COUNT":
                        raise ValueError(
                            "DISTINCT is only supported inside COUNT")
                    fn_name = "COUNT_DISTINCT"
                t = p.term()
                if t.kind != "var":
                    raise ValueError(f"{fv.upper()} needs a variable")
                if fn_name == "GROUP_CONCAT" \
                        and p.peek() == ("op", ";"):
                    p.next()
                    if not p.kw("SEPARATOR"):
                        raise ValueError("expected SEPARATOR after ';'")
                    p.expect_op("=")
                    sk, sv = p.next()
                    if sk != "str":
                        raise ValueError("SEPARATOR needs a string")
                    q.agg_sep = re.sub(r"\\(.)", r"\1", sv[1:-1])
                p.expect_op(")")
                if not p.kw("AS"):
                    raise ValueError("aggregate needs AS ?alias")
                ak, av = p.next()
                if ak != "var":
                    raise ValueError("aggregate alias must be a variable")
                p.expect_op(")")
                q.aggs.append((fn_name, t.value, av[1:]))
            else:
                break
        if not vs and not q.aggs:
            raise ValueError("SELECT needs variables or *")
        q.select_vars = vs
    return q


def _check_subquery(sub: SparqlQuery) -> None:
    """Subset contract for a WHERE-element subquery: a grouped
    aggregate block whose visible columns (GROUP BY vars + aggregate
    aliases) inner-join the outer group — no pagination, no nesting."""
    if not sub.aggs or not sub.group_by:
        raise ValueError("a subquery must be a grouped aggregate "
                         "(SELECT ... (AGG(?x) AS ?a) ... GROUP BY ...)")
    if sub.subqueries:
        raise ValueError("nested subqueries are out of subset")
    if sub.distinct:
        raise ValueError("DISTINCT inside an aggregate subquery is "
                         "out of subset")
    if sub.limit is not None or sub.offset or sub.order_by:
        raise ValueError("ORDER BY / LIMIT / OFFSET inside a subquery "
                         "are out of subset (join order is immaterial)")
    stray = [v for v in (sub.select_vars or []) if v not in sub.group_by]
    if stray:
        raise ValueError(
            f"subquery SELECT vars must be GROUP BY vars (got ?{stray[0]})")
    clash = [a for _, _, a in sub.aggs if a in sub.group_by]
    if clash:
        raise ValueError(
            f"subquery alias ?{clash[0]} collides with a GROUP BY var")


def _parse_where_and_modifiers(p: _P, q: SparqlQuery,
                               in_subquery: bool = False) -> SparqlQuery:
    if not p.kw("WHERE") and not q.ask:
        raise ValueError("expected WHERE")  # ASK allows a bare block

    def parse_plain_group() -> tuple[list[Pattern], list[tuple]]:
        """``{ tp . tp . FILTER }`` (no nesting); consumes through ``}``."""
        p.expect_op("{")
        pats: list[Pattern] = []
        flts: list[tuple] = []
        while p.peek() != ("op", "}"):
            if p.kw("FILTER"):
                p.expect_op("(")
                flts.append(p.expr())
                p.expect_op(")")
            else:
                pats.extend(p.triple_patterns())
            if p.peek() == ("op", "."):
                p.next()
        p.next()  # }
        if not pats:
            raise ValueError("group needs at least one pattern")
        return pats, flts

    def _at_subquery() -> bool:
        nk, nv = p.peek2()
        return (p.peek() == ("op", "{")
                and nk == "kw" and nv.upper() == "SELECT")

    p.expect_op("{")
    if p.peek() == ("op", "{") and not _at_subquery():
        # union form: WHERE { { bgp } UNION { bgp } [UNION ...] }
        q.unions.append(parse_plain_group())
        while p.kw("UNION"):
            q.unions.append(parse_plain_group())
        if len(q.unions) < 2:
            raise ValueError("a braced WHERE body needs UNION branches")
        if p.peek() != ("op", "}"):
            raise ValueError("UNION branches cannot mix with other "
                             "WHERE elements in this subset")
        p.next()  # }
    else:
        while p.peek() != ("op", "}"):
            if p.kw("FILTER"):
                if p.kw("NOT"):
                    if not p.kw("EXISTS"):
                        raise ValueError("expected EXISTS after FILTER NOT")
                    q.not_exists.append(parse_plain_group())
                elif p.kw("EXISTS"):
                    q.exists.append(parse_plain_group())
                else:
                    p.expect_op("(")
                    q.filters.append(p.expr())
                    p.expect_op(")")
            elif p.kw("MINUS"):
                q.minus.append(parse_plain_group())
            elif p.kw("BIND"):
                # BIND(CONCAT(arg, ...) AS ?v) | BIND(term AS ?v)
                p.expect_op("(")
                if p.kw("CONCAT"):
                    p.expect_op("(")
                    args = [p.term()]
                    while p.peek() == ("op", ","):
                        p.next()
                        args.append(p.term())
                    p.expect_op(")")
                    expr = ("concat", args)
                elif p.kw("IF"):
                    # BIND(IF(cond, then, else) AS ?v) — cond is a
                    # full filter expression (BOUND over OPTIONAL vars
                    # is the canonical use); a null cond (comparison
                    # on an unmatched optional var) selects `else`,
                    # matching SQL CASE WHEN
                    p.expect_op("(")
                    cond = p.expr()
                    p.expect_op(",")
                    t_then = p.term()
                    p.expect_op(",")
                    t_else = p.term()
                    p.expect_op(")")
                    expr = ("if", cond, t_then, t_else)
                elif p.kw("COALESCE"):
                    # BIND(COALESCE(?a, ?b, "fallback") AS ?v) — like
                    # IF, runs AFTER the OPTIONAL joins so it can pick
                    # the first bound optional var (its whole point)
                    p.expect_op("(")
                    args = [p.term()]
                    while p.peek() == ("op", ","):
                        p.next()
                        args.append(p.term())
                    p.expect_op(")")
                    expr = ("coalesce", args)
                else:
                    fname = next((f for f in _STRFNS if p.kw(f)), None)
                    if fname is not None:
                        # BIND(UCASE|LCASE|SUBSTR|REPLACE|STRBEFORE|
                        #      STRAFTER(...) AS ?v) — flat argument
                        # lists (terms, not nested expressions)
                        p.expect_op("(")
                        args = [p.term()]
                        while p.peek() == ("op", ","):
                            p.next()
                            args.append(p.term())
                        p.expect_op(")")
                        _check_strfn(fname, args)
                        expr = ("strfn", fname, args)
                    else:
                        nfname = next((f for f in _NUMFNS if p.kw(f)),
                                      None)
                        if nfname is not None:
                            # BIND(ABS|CEIL|FLOOR|ROUND(?v) AS ?x)
                            p.expect_op("(")
                            arg = p.term()
                            p.expect_op(")")
                            _check_numbind(nfname, [arg])
                            expr = ("numfn", nfname, [arg])
                        else:
                            t1 = p.term()
                            if p.peek() in (("op", "+"), ("op", "-"),
                                            ("op", "*")):
                                # BIND(?a op ?b|int AS ?x) — one
                                # binary integer operation (flat; no
                                # precedence chains in subset)
                                _, aop = p.next()
                                t2 = p.term()
                                _check_numbind(aop, [t1, t2])
                                expr = ("arith", aop, t1, t2)
                            else:
                                expr = ("term", t1)
                if not p.kw("AS"):
                    raise ValueError("BIND needs AS ?var")
                vk, vv = p.next()
                if vk != "var":
                    raise ValueError("BIND target must be a variable")
                p.expect_op(")")
                q.binds.append((vv[1:], expr))
            elif p.kw("OPTIONAL"):
                q.optionals.append(parse_plain_group())
            elif p.kw("GRAPH"):
                # GRAPH term { tp . tp . FILTER } — scope each pattern
                # to a named graph (constant IRI or graph variable);
                # filters inside the block are conjunctive, same as
                # top-level (both backends apply them identically)
                gterm = p.term()
                if gterm.kind in ("lit", "num"):
                    raise ValueError("GRAPH needs an IRI or variable")
                p.expect_op("{")
                while p.peek() != ("op", "}"):
                    if p.kw("FILTER"):
                        p.expect_op("(")
                        q.filters.append(p.expr())
                        p.expect_op(")")
                    else:
                        for pt in p.triple_patterns():
                            if pt.p.kind.startswith("path") \
                                    and gterm.kind != "iri":
                                raise ValueError(
                                    "path modifiers under GRAPH need "
                                    "a constant graph IRI")
                            q.patterns.append(
                                Pattern(pt.s, pt.p, pt.o, gterm))
                    if p.peek() == ("op", "."):
                        p.next()
                p.next()  # }
            elif p.kw("VALUES"):
                if p.peek() == ("op", "("):
                    # multi-variable form:
                    # VALUES (?x ?y) { (a b) (c d) ... }
                    p.next()
                    tvars: list[str] = []
                    while p.peek() != ("op", ")"):
                        tv = p.term()
                        if tv.kind != "var":
                            raise ValueError("VALUES needs variables")
                        tvars.append(tv.value)
                    p.next()  # )
                    if not tvars:
                        raise ValueError("VALUES needs a variable")
                    p.expect_op("{")
                    rows: list[tuple[str, ...]] = []
                    while p.peek() != ("op", "}"):
                        p.expect_op("(")
                        row: list[str] = []
                        while p.peek() != ("op", ")"):
                            t_ = p.term()
                            if t_.kind == "var":
                                raise ValueError(
                                    "VALUES data must be constants")
                            row.append(t_.value)
                        p.next()  # )
                        if len(row) != len(tvars):
                            raise ValueError(
                                "VALUES row arity != variable count")
                        rows.append(tuple(row))
                    p.next()  # }
                    if not rows:
                        raise ValueError("VALUES needs at least one row")
                    q.filters.append(("in_tuple", tvars, rows))
                else:
                    # single-variable inline-data form: VALUES ?x { v v }
                    var = p.term()
                    if var.kind != "var":
                        raise ValueError("VALUES needs a variable")
                    p.expect_op("{")
                    vals: list[str] = []
                    while p.peek() != ("op", "}"):
                        t_ = p.term()
                        if t_.kind == "var":
                            raise ValueError("VALUES data must be constants")
                        vals.append(t_.value)
                    p.next()  # }
                    if not vals:
                        raise ValueError("VALUES needs at least one value")
                    q.filters.append(("in", var.value, vals))
            elif p.peek() == ("op", "{"):
                # aggregate subquery as a WHERE element:
                # { SELECT ?g (AGG(?x) AS ?a) WHERE {...} GROUP BY ?g }
                # — inner-joined to the outer group on the shared
                # GROUP BY variables; the alias becomes a new binding
                if not _at_subquery():
                    raise ValueError(
                        "a braced WHERE element must be a subquery "
                        "({ SELECT ... }) in this subset")
                p.next()  # {
                p.kw("SELECT")
                sub = _parse_select_clause(p)
                sub = _parse_where_and_modifiers(p, sub,
                                                 in_subquery=True)
                p.expect_op("}")
                _check_subquery(sub)
                q.subqueries.append(sub)
            else:
                q.patterns.extend(p.triple_patterns())
            if p.peek() == ("op", "."):
                p.next()
        p.next()  # }
    if p.kw("GROUP"):
        if not p.kw("BY"):
            raise ValueError("expected BY after GROUP")
        while p.peek()[0] == "var":
            q.group_by.append(p.next()[1][1:])
        if not q.group_by:
            raise ValueError("GROUP BY needs at least one variable")
    while p.kw("HAVING"):
        p.expect_op("(")
        q.having.append(p.expr())
        p.expect_op(")")
    if p.kw("ORDER"):
        if not p.kw("BY"):
            raise ValueError("expected BY after ORDER")
        while True:
            k, v = p.peek()
            if k == "var":
                p.next()
                q.order_by.append((v[1:], True))
            elif k == "kw" and v.upper() in ("ASC", "DESC"):
                asc = v.upper() == "ASC"
                p.next()
                p.expect_op("(")
                t = p.term()
                p.expect_op(")")
                q.order_by.append((t.value, asc))
            else:
                break
        if not q.order_by:
            raise ValueError("ORDER BY needs at least one key")
    # LIMIT / OFFSET in either order
    for _ in range(2):
        if p.kw("LIMIT"):
            q.limit = int(p.next()[1])
        elif p.kw("OFFSET"):
            q.offset = int(p.next()[1])
    if not in_subquery and p.i != len(p.toks):
        raise ValueError(f"trailing tokens at {p.toks[p.i:]}")
    if not q.patterns and not q.unions and not q.subqueries:
        raise ValueError("WHERE needs at least one triple pattern")
    if q.offset and q.limit is None:
        raise ValueError("OFFSET requires LIMIT")
    if (q.limit is not None or q.offset) and not q.order_by:
        raise ValueError("LIMIT/OFFSET require ORDER BY (deterministic cut)")
    if q.unions:
        branch_vars = []
        for pats, _ in q.unions:
            bv = set()
            for pat in pats:
                bv.update(v for v in pat.vars()
                          if not v.startswith(_INTERNAL))
            branch_vars.append(bv)
        if any(bv != branch_vars[0] for bv in branch_vars[1:]):
            raise ValueError(
                "every UNION branch must bind the same variable set "
                "(null-filling unbound union vars is out of subset)")
        required = set(branch_vars[0])
    else:
        required = set()
        for pat in q.patterns:
            required.update(pat.vars())
    # subquery visible columns (GROUP BY vars + aggregate aliases)
    # inner-join the outer group, so they bind required (never-null)
    # variables; an alias shadowing an existing binding is rejected
    opt_vars = {v for pats, _ in q.optionals for pat in pats
                for v in pat.vars()}
    for sub in q.subqueries:
        for _, _, a in sub.aggs:
            if a in required or a in opt_vars:
                raise ValueError(
                    f"subquery alias ?{a} rebinds an outer variable")
            required.add(a)
        required.update(sub.group_by)
    if not required and not q.ask:
        raise ValueError(
            "the query binds no variables — only ASK supports an "
            "all-constant pattern body")
    known = set(required)
    for pats, _ in q.optionals:
        for pat in pats:
            known.update(pat.vars())
    prebound: set = set()  # earlier pre-bind targets are referencable
    for v, expr in q.binds:
        if expr[0] == "if":
            # IF binds run AFTER the OPTIONAL joins (BOUND over an
            # optional var is their point), so any known var is fine
            args = set()
            for t_ in (expr[2], expr[3]):
                if t_.kind == "var":
                    args.add(t_.value)
            args |= _expr_vars(expr[1])
            for a in args:
                if a not in known:
                    raise ValueError(f"BIND IF argument ?{a} is unbound")
        elif expr[0] == "coalesce":
            # COALESCE also runs after the OPTIONAL joins — picking
            # the first bound optional var is its point
            for t_ in expr[1]:
                if t_.kind == "var" and t_.value not in known:
                    raise ValueError(
                        f"BIND COALESCE argument ?{t_.value} is unbound")
        else:
            terms = (expr[1] if expr[0] == "concat"
                     else expr[2] if expr[0] == "strfn"
                     else expr[2] if expr[0] == "numfn"
                     else [expr[2], expr[3]] if expr[0] == "arith"
                     else [expr[1]])
            for t_ in terms:
                if t_.kind == "var" \
                        and t_.value not in required \
                        and t_.value not in prebound:
                    raise ValueError(
                        f"BIND argument ?{t_.value} must be a "
                        "required-group variable or an earlier BIND "
                        "target (nullable args are out of subset; use "
                        "BIND(IF(...)/COALESCE(...)) for optional vars)")
            prebound.add(v)
        if v in known:
            raise ValueError(f"BIND target ?{v} is already bound")
        known.add(v)
    # LANG(?v) filters/conds: collect the vars, require each bound at
    # the OBJECT position of exactly ONE non-path pattern anywhere in
    # the query — that scan then projects obj_lang as __pplang_{v}
    all_exprs = list(q.filters) \
        + [e for _, f in q.optionals for e in f] \
        + [e for _, f in q.unions for e in f] \
        + [e for _, f in q.not_exists for e in f] \
        + [e for _, f in q.minus for e in f] \
        + [e for _, f in q.exists for e in f] \
        + [b[1][1] for b in q.binds if b[1][0] == "if"]
    q.lang_vars, q.lit_vars, q.dt_vars = set(), set(), set()
    for e in all_exprs:
        q.lang_vars |= _expr_meta_vars(e, "lang")
        q.lit_vars |= _expr_meta_vars(e, "lit")
        q.dt_vars |= _expr_meta_vars(e, "dt")
    if q.lang_vars or q.lit_vars or q.dt_vars:
        all_pats = list(q.patterns) \
            + [pat for pats, _ in q.optionals for pat in pats] \
            + [pat for pats, _ in q.unions for pat in pats] \
            + [pat for pats, _ in q.not_exists for pat in pats] \
            + [pat for pats, _ in q.minus for pat in pats] \
            + [pat for pats, _ in q.exists for pat in pats]
        for fname, mvars in (("LANG", q.lang_vars),
                             ("isLiteral/isIRI", q.lit_vars),
                             ("DATATYPE", q.dt_vars)):
            for lv in sorted(mvars):
                binders = [pat for pat in all_pats
                           if pat.o.kind == "var" and pat.o.value == lv]
                if len(binders) != 1:
                    raise ValueError(
                        f"{fname}(?{lv}) needs ?{lv} bound at the "
                        f"object position of exactly one pattern "
                        f"(found {len(binders)})")
                if binders[0].p.kind.startswith("path"):
                    raise ValueError(
                        f"{fname}(?{lv}) over a property-path endpoint "
                        "is out of subset (closures drop literal "
                        "metadata)")
    for label, groups in (("FILTER NOT EXISTS", q.not_exists),
                          ("FILTER EXISTS", q.exists)):
        for pats, _ in groups:
            ne_vars = set()
            for pat in pats:
                ne_vars.update(pat.vars())
            if not (ne_vars & known):
                raise ValueError(
                    f"{label} group shares no variable with the outer "
                    "pattern (uncorrelated semi/anti-join is out of "
                    "subset)")
    # MINUS with no shared variable is legal and removes nothing (the
    # spec's compatibility rule) — handled as a no-op at build time
    for v in q.select_vars or []:
        if v not in known:
            raise ValueError(f"SELECT variable ?{v} is not bound")
    if q.aggs:
        if q.distinct:
            raise ValueError("DISTINCT with aggregates is not supported")
        if any(fn in ("GROUP_CONCAT", "COUNT_DISTINCT")
               for fn, _, _ in q.aggs) and len(q.aggs) > 1:
            raise ValueError(
                "GROUP_CONCAT/COUNT(DISTINCT) cannot combine with "
                "other aggregates")
        aliases = [alias for _, _, alias in q.aggs]
        if len(set(aliases)) != len(aliases):
            raise ValueError("duplicate aggregate alias")
        for fn, avar, _alias in q.aggs:
            if avar not in required:
                raise ValueError(
                    f"{fn}(?{avar}) must aggregate a required "
                    "(non-OPTIONAL) variable — null-skipping "
                    "aggregates are out of subset")
        if set(q.select_vars or []) != set(q.group_by):
            raise ValueError(
                "aggregate SELECT must project exactly the GROUP BY vars")
        out = set(q.group_by) | set(aliases)
        if q.having:
            if not q.group_by:
                raise ValueError("HAVING requires GROUP BY")

            def _hvars(e) -> set:
                tag = e[0]
                if tag in ("or", "and"):
                    return _hvars(e[1]) | _hvars(e[2])
                if tag == "not":
                    return _hvars(e[1])
                if tag == "cmp":
                    if not any(not isinstance(x, tuple) and x.kind == "num"
                               for x in (e[2], e[3])):
                        raise ValueError(
                            "HAVING comparisons need a numeric literal "
                            "on one side (aggregate aliases compare "
                            "numerically)")
                    return {x.value for x in (e[2], e[3])
                            if not isinstance(x, tuple)
                            and x.kind == "var"}
                raise ValueError(
                    "HAVING supports comparisons combined with "
                    "&&/||/! in this subset")

            for e in q.having:
                for v in _hvars(e):
                    if v not in out:
                        raise ValueError(
                            f"HAVING variable ?{v} must be a GROUP BY "
                            "variable or an aggregate alias")
    elif q.having:
        raise ValueError("HAVING requires aggregates in SELECT")
    elif q.group_by:
        raise ValueError("GROUP BY requires an aggregate in SELECT")
    else:
        out = set(q.select_vars) if q.select_vars is not None else known
    for v, _ in q.order_by:
        if v not in out:
            raise ValueError(f"ORDER BY ?{v} must be a selected variable")
    if q.ask and (q.aggs or q.order_by
                  or q.limit is not None or q.distinct):
        raise ValueError("ASK takes no solution modifiers")
    if q.construct:
        if q.aggs or q.order_by or q.limit is not None \
                or q.distinct:
            raise ValueError("CONSTRUCT takes no solution modifiers in "
                             "this subset (the result is already a "
                             "distinct triple set)")
        for tp in q.construct:
            for v in tp.vars():
                if v not in known:
                    raise ValueError(
                        f"CONSTRUCT template variable ?{v} is not bound")
    if q.describe:
        if q.aggs or q.order_by or q.limit is not None or q.distinct:
            raise ValueError("DESCRIBE takes no solution modifiers in "
                             "this subset (the result is already a "
                             "distinct triple set)")
        for t in q.describe:
            if t.kind == "var" and t.value not in required:
                raise ValueError(
                    f"DESCRIBE variable ?{t.value} must be bound by a "
                    "required (non-OPTIONAL) pattern")
    return q


# ---------------------------------------------------------------------------
# Ray Data backend
# ---------------------------------------------------------------------------


def _is_store(quads) -> bool:
    """Pred-partitioned QuadStore handle vs plain quads Dataset
    (state/quadstore.py — duck-typed to avoid an import cycle)."""
    return hasattr(quads, "scan_for_preds")


def _pattern_source(quads, pat: Pattern,
                    meta_vars: frozenset = frozenset()):
    """The source a pattern scan runs over: a QuadStore prunes to the
    buckets a BOUND predicate (constant IRI or alternation list)
    hashes into — the storage-side fix for the n-patterns-pay-n-full-
    corpus-scans tax — and reads ONLY the columns the pattern binds
    (positions + any metadata source columns LANG()/isLiteral()/
    DATATYPE() project); var / negated-alternation predicates and
    plain Datasets scan everything, as before."""
    if not _is_store(quads):
        return quads
    need: list[str] = []
    for _term, col in pat.positions():
        if col not in need:
            need.append(col)
    for kind, mv in sorted(meta_vars):
        if pat.o.kind == "var" and pat.o.value == mv:
            src = _META_KINDS[kind][1]
            if src not in need:
                need.append(src)
    if pat.p.kind == "iri":
        return quads.scan_for_preds([pat.p.value], columns=need)
    if pat.p.kind == "alt":
        return quads.scan_for_preds(pat.p.value.split(_SEP),
                                    columns=need)
    return quads.full(columns=need)


def _make_scan(pat: Pattern, meta_vars: frozenset = frozenset()):
    # object var referenced by LANG()/isLiteral()/DATATYPE() → also
    # project the metadata source column under its internal
    # __pp{kind}_{var} name (validated single-binder). meta_vars holds
    # (kind, var) pairs (SparqlQuery.meta_specs()).
    metas = [(kind, mv) for kind, mv in sorted(meta_vars)
             if pat.o.kind == "var" and pat.o.value == mv]

    def scan(t: pa.Table) -> pa.Table:
        mask = None
        seen: dict[str, str] = {}
        for term, col in pat.positions():
            if term.kind == "var":
                if term.value in seen:  # same var twice in one pattern
                    m = pc.equal(t.column(seen[term.value]), t.column(col))
                    mask = m if mask is None else pc.and_(mask, m)
                else:
                    seen[term.value] = col
            elif term.kind in ("alt", "nalt"):  # (p1|p2|...) / !(…)
                m = pc.is_in(t.column(col), value_set=pa.array(
                    term.value.split(_SEP), pa.string()))
                if term.kind == "nalt":
                    m = pc.invert(m)
                mask = m if mask is None else pc.and_(mask, m)
            else:
                m = pc.equal(t.column(col), term.value)
                mask = m if mask is None else pc.and_(mask, m)
        if mask is not None:
            t = t.filter(mask)
        if not seen:  # all-constant pattern (canonical ASK form):
            # preserve the MATCH COUNT through a dummy column — an
            # empty projection would have zero rows regardless of
            # matches and flip ASK to a wrong False
            return pa.table({"__const": pa.nulls(t.num_rows, pa.string())})
        out = {v: t.column(col) for v, col in seen.items()}
        for kind, mv in metas:
            colfn, src = _META_KINDS[kind]
            out[colfn(mv)] = t.column(src)
        return pa.table(out)

    return scan


def _make_pair_scan(pat: Pattern):
    """Project a closure pair table (__a/__b) onto the pattern's
    subject/object terms — constants filter, variables name columns
    (same contract as _make_scan, p slot already consumed)."""

    def scan(t: pa.Table) -> pa.Table:
        mask = None
        seen: dict[str, str] = {}
        for term, col in ((pat.s, "__a"), (pat.o, "__b")):
            if term.kind == "var":
                if term.value in seen:  # ?x p+ ?x: cyclic nodes
                    m = pc.equal(t.column(seen[term.value]), t.column(col))
                    mask = m if mask is None else pc.and_(mask, m)
                else:
                    seen[term.value] = col
            else:
                m = pc.equal(t.column(col), term.value)
                mask = m if mask is None else pc.and_(mask, m)
        if mask is not None:
            t = t.filter(mask)
        return pa.table({v: t.column(col) for v, col in seen.items()})

    return scan


def _pair_keyed(t: pa.Table) -> pa.Table:
    return t.append_column("__k", pc.binary_join_element_wise(
        t.column("__a"), t.column("__b"), _SEP))


def _pair_distinct(ds):
    """Distinct __a/__b pairs via ONE composite-key groupby (the key
    determines both columns, so Min reconstructs them); materialized
    and scrubbed so the pairs are join-safe."""
    from ray.data.aggregate import Min

    from k_gap_ray.dsutil import drop_empty_blocks

    ded = (ds.groupby("__k").aggregate(
        Min("__a", alias_name="__a"), Min("__b", alias_name="__b"))
        .map_batches(lambda t: t.select(["__a", "__b", "__k"]),
                     batch_format="pyarrow"))
    return drop_empty_blocks(ded.materialize())


def _edge_pairs(quads, pred: str, graph: str | None):
    """Distinct keyed (__a, __b, __k) edge pairs of the pred relation
    (several _SEP-joined IRIs = the UNION edge set of an alternative
    step), optionally scoped to one named graph."""
    preds = pred.split(_SEP)

    def scan(t: pa.Table) -> pa.Table:
        if len(preds) == 1:
            m = pc.equal(t.column("pred"), preds[0])
        else:
            m = pc.is_in(t.column("pred"),
                         value_set=pa.array(preds, pa.string()))
        if graph is not None:
            m = pc.and_(m, pc.equal(t.column("graph"), graph))
        sel = t.filter(m)
        return pa.table({"__a": sel.column("subj"),
                         "__b": sel.column("obj")})

    src = quads.scan_for_preds(
        preds, columns=["subj", "pred", "obj"]
        + (["graph"] if graph is not None else [])) \
        if _is_store(quads) else quads
    return _pair_distinct(
        src.map_batches(scan, batch_format="pyarrow")
        .map_batches(_pair_keyed, batch_format="pyarrow"))


def _identity_pairs(quads, graph: str | None):
    """The zero-hop relation: (x, x) for every term in the graph
    (distinct subjects ∪ objects, optionally graph-scoped) — the base
    of the reflexive closures behind ``*`` and ``?`` path modifiers.
    The SQL backend mirrors it with the same node-set subquery."""

    def node_scan(t: pa.Table) -> pa.Table:
        if graph is not None:
            t = t.filter(pc.equal(t.column("graph"), graph))
        both = pa.concat_tables([
            pa.table({"__n": t.column("subj")}),
            pa.table({"__n": t.column("obj")})])
        nodes = both.column("__n")
        return pa.table({"__a": nodes, "__b": nodes})

    src = quads.full(columns=["subj", "obj"]
                     + (["graph"] if graph is not None else [])) \
        if _is_store(quads) else quads
    return _pair_distinct(
        src.map_batches(node_scan, batch_format="pyarrow")
        .map_batches(_pair_keyed, batch_format="pyarrow"))


def _path_star(quads, pred: str, graph: str | None = None):
    """Zero-or-more: identity over the graph's node set ∪ the
    transitive closure of the pred edge set."""
    ident = _identity_pairs(quads, graph)
    if ident.count() == 0:  # no quads at all (or none in the graph)
        return None
    clo = _path_plus(quads, pred, graph)
    if clo is None:
        return ident
    return _pair_distinct(ident.union(clo))


def _path_opt(quads, pred: str, graph: str | None = None):
    """Zero-or-one: identity over the graph's node set ∪ the single-hop
    pred edges (set semantics, same as the SQL UNION mirror)."""
    ident = _identity_pairs(quads, graph)
    if ident.count() == 0:
        return None
    edges = _edge_pairs(quads, pred, graph)
    if edges.count() == 0:
        return ident
    return _pair_distinct(ident.union(edges))


def _path_plus(quads, pred: str, graph: str | None = None):
    """Transitive closure (one-or-more hops) of the ``pred`` edge
    relation, as a Dataset with columns __a/__b/__k — the scan
    relation behind a ``<p>+`` pattern slot. ``pred`` may carry
    several _SEP-joined IRIs (an ``(p1|p2)+`` alternative step): the
    closure then runs over the UNION edge set. ``graph`` (constant
    IRI) restricts the edge set to one named graph.

    Semi-naive iteration in pure Dataset ops: each round joins only
    the newly-discovered pairs (delta) against the base edges, dedups
    via ONE composite-key groupby, and anti-joins against the closure
    so already-known pairs never re-enter the frontier; terminates on
    cycles because the pair set grows monotonically. All-pairs by
    design (both endpoints may be unbound variables); when one
    endpoint is a constant, the seeded frontier walk
    (relational.dereference) is the cheaper scale path — same
    semantics, documented trade-off. The SQL oracle closes the same
    relation with a recursive CTE (see _group_sql)."""
    from k_gap_ray.dsutil import drop_empty_blocks, join_datasets

    cols = ["__a", "__b", "__k"]
    keyed = _pair_keyed
    distinct = _pair_distinct

    edges = _edge_pairs(quads, pred, graph)
    if edges.count() == 0:  # predicate absent: empty closure, and an
        # all-empty side would crash the hash join below
        return None  # caller synthesizes the typed empty scan —
        # map_batches SKIPS zero-row blocks, so returning an empty
        # __a/__b/__k dataset here would keep the WRONG schema through
        # _make_pair_scan and crash any later join on a pattern var
    closure, delta = edges, edges
    while True:
        hop = join_datasets(
            delta.map_batches(lambda t: pa.table(
                {"__a": t.column("__a"), "__j": t.column("__b")}),
                batch_format="pyarrow"),
            edges.map_batches(lambda t: pa.table(
                {"__j": t.column("__a"), "__nb": t.column("__b")}),
                batch_format="pyarrow"),
            on="__j", scrub_left=False, scrub_right=False)
        hop = distinct(hop.map_batches(lambda t: keyed(pa.table(
            {"__a": t.column("__a"), "__b": t.column("__nb")})),
            batch_format="pyarrow"))
        if hop.count() == 0:  # frontier reached only sink nodes: a
            return closure    # fully-empty hop loses its schema and
                              # would crash the anti-join below
        seen = closure.map_batches(lambda t: pa.table(
            {"__k": t.column("__k"),
             "__seen": pa.array([1] * t.num_rows, pa.int64())}),
            batch_format="pyarrow")
        new = (join_datasets(hop, seen, on="__k", join_type="left_outer",
                             scrub_left=False, scrub_right=False)
               .map_batches(
                   lambda t: t.filter(pc.is_null(t.column("__seen")))
                   .select(cols), batch_format="pyarrow")
               .materialize())
        if new.count() == 0:
            return closure
        new = drop_empty_blocks(new)
        closure = drop_empty_blocks(closure.union(new).materialize())
        delta = new


def _strfn_array(fname: str, args: list, t: pa.Table):
    """Vectorized Arrow kernel for one BIND string function. Arg 0 is
    the subject column (var or literal); trailing args are validated
    literals/ints (_check_strfn). Backend parity notes in _STRFNS."""
    a0 = args[0]
    col = t.column(a0.value) if a0.kind == "var" \
        else pa.array([a0.value] * t.num_rows, pa.string())
    if fname == "UCASE":
        return pc.utf8_upper(col)
    if fname == "LCASE":
        return pc.utf8_lower(col)
    if fname == "SUBSTR":
        start = int(args[1].value) - 1  # SPARQL/SQL are 1-based
        stop = start + int(args[2].value) if len(args) == 3 else None
        # despite the name, utf8_slice_codeunits slices by CODEPOINTS
        # (verified against DuckDB substr on non-ASCII)
        return pc.utf8_slice_codeunits(col, start, stop)
    if fname == "REPLACE":
        # both engines run RE2 with global replacement
        return pc.replace_substring_regex(
            col, pattern=args[1].value, replacement=args[2].value)
    # STRBEFORE / STRAFTER: non-empty literal delimiter (validated);
    # SPARQL returns "" when the delimiter does not occur
    d = args[1].value
    found = pc.greater_equal(pc.find_substring(col, pattern=d), 0)
    if fname == "STRBEFORE":
        out = pc.replace_substring_regex(
            col, pattern="(?s)" + re.escape(d) + ".*$",
            replacement="", max_replacements=1)
    else:
        out = pc.replace_substring_regex(
            col, pattern="(?s)^.*?" + re.escape(d),
            replacement="", max_replacements=1)
    return pc.if_else(found, out, "")


def _int_col(col):
    """String column → int64 with non-integer lexicals nulled — the
    exact two-backend integer coercion. SQL mirror:
    ``TRY_CAST(CASE WHEN regexp_matches(x, '^[+-]?\\d+$') THEN x END
    AS BIGINT)`` (a bare TRY_CAST AS BIGINT would ROUND '4.5' to 5 in
    DuckDB; Arrow's cast can't parse a leading '+', so it is stripped
    after the guard — both quirks measured, BENCH/NOTES.md)."""
    if pa.types.is_integer(col.type):
        return pc.cast(col, pa.int64())
    ok = pc.match_substring_regex(col, _INT_RE)
    g = pc.if_else(ok, col, pa.scalar(None, pa.string()))
    g = pc.replace_substring_regex(g, pattern=r"^\+", replacement="",
                                   max_replacements=1)
    return pc.cast(g, pa.int64())


def _numbind_array(expr: tuple, t: pa.Table):
    """Vectorized numeric BIND: integer-exact on both backends, the
    result rendered as its canonical integer string (null stays null)
    so the bound var stays in the all-string variable model. Checked
    kernels raise on int64 overflow — DuckDB's BIGINT ops raise too,
    so neither backend wraps silently."""
    def int_part(x):
        if x.kind == "var":
            return _int_col(t.column(x.value))
        return pa.scalar(int(x.value), pa.int64())

    if expr[0] == "arith":
        _, op, a, b = expr
        fn = {"+": pc.add_checked, "-": pc.subtract_checked,
              "*": pc.multiply_checked}[op]
        out = fn(int_part(a), int_part(b))
    else:
        _, name, (a,) = expr
        if name == "ABS":
            out = pc.abs_checked(int_part(a))
        else:
            col = _numeric_col(t.column(a.value))
            if name == "CEIL":
                d = pc.ceil(col)
            elif name == "FLOOR":
                d = pc.floor(col)
            else:  # ROUND: DuckDB rounds half AWAY from zero
                d = pc.round(col, round_mode="half_towards_infinity")
            out = pc.cast(d, pa.int64())
    return pc.cast(out, pa.string())


def _numbind_sql(expr: tuple, bind: dict) -> str:
    """The DuckDB mirror of :func:`_numbind_array` (see its note on
    why the BIGINT coercion needs the regexp guard)."""
    def iref(x) -> str:
        if x.kind == "num":
            return x.value
        r = bind[x.value]
        return (f"TRY_CAST(CASE WHEN regexp_matches({r}, "
                f"'^[+-]?\\d+$') THEN {r} END AS BIGINT)")

    if expr[0] == "arith":
        _, op, a, b = expr
        return f"CAST(({iref(a)} {op} {iref(b)}) AS VARCHAR)"
    _, name, (a,) = expr
    if name == "ABS":
        return f"CAST(abs({iref(a)}) AS VARCHAR)"
    fn = {"CEIL": "ceil", "FLOOR": "floor", "ROUND": "round"}[name]
    dref = f"TRY_CAST({bind[a.value]} AS DOUBLE)"
    return f"CAST(CAST({fn}({dref}) AS BIGINT) AS VARCHAR)"


def _numeric_col(col):
    """String column → float64 with non-numeric values nulled — the
    Arrow mirror of DuckDB's TRY_CAST(col AS DOUBLE): a failed parse
    yields null, a null comparison drops the row on both backends.
    Already-numeric columns (aggregate aliases in HAVING) just cast."""
    t = col.type
    if pa.types.is_integer(t) or pa.types.is_floating(t):
        return pc.cast(col, pa.float64())
    ok = pc.match_substring_regex(col, _NUM_RE)
    return pc.cast(pc.if_else(ok, col, pa.scalar(None, pa.string())),
                   pa.float64())


def _eval(e: tuple, t: pa.Table):
    tag = e[0]
    if tag == "or":
        return pc.or_(_eval(e[1], t), _eval(e[2], t))
    if tag == "and":
        return pc.and_(_eval(e[1], t), _eval(e[2], t))
    if tag == "not":  # null stays null (row dropped), matching SQL NOT
        return pc.invert(_eval(e[1], t))
    if tag == "bound":
        return pc.is_valid(t.column(e[1]))
    if tag == "in":  # VALUES / FILTER IN: membership mask. A null
        # input yields null (not false) so that NOT IN over an
        # unmatched optional var drops the row, matching SQL
        _, var, vals = e
        col = t.column(var)
        m = pc.is_in(col, value_set=pa.array(vals, pa.string()))
        return pc.if_else(pc.is_valid(col), m, pa.scalar(None, pa.bool_()))
    if tag == "isliteral":  # bool metadata column from the binding
        # scan (__pplit_{var}); null (unmatched optional) drops the
        # row on both backends
        return pc.cast(t.column(_lit_col(e[1])), pa.bool_())
    if tag == "in_tuple":  # multi-var VALUES: composite-key membership
        _, tvars, rows = e
        sep = "\x1f"
        key = pc.binary_join_element_wise(
            *[t.column(v) for v in tvars], sep)
        return pc.is_in(key, value_set=pa.array(
            [sep.join(r) for r in rows], pa.string()))
    if tag == "fn":
        _, name, var, lit = e
        col = t.column(var)
        if name == "STRSTARTS":
            return pc.starts_with(col, lit)
        if name == "STRENDS":
            return pc.ends_with(col, lit)
        if name == "REGEX":
            return pc.match_substring_regex(col, lit)
        return pc.match_substring(col, lit)  # CONTAINS, literal substring
    _, op, left, right = e
    # a numeric literal (or STRLEN) on either side switches the
    # comparison to numeric: var strings coerce via _numeric_col
    numeric = any(
        (isinstance(x, tuple) and x[0] in ("strlen", "arithx"))
        or (not isinstance(x, tuple) and x.kind == "num")
        for x in (left, right))

    def operand(x):
        if isinstance(x, tuple):
            if x[0] == "lang":
                return t.column(_lang_col(x[1]))
            if x[0] == "dt":
                return t.column(_dt_col(x[1]))
            if x[0] == "arithx":  # DOUBLE-domain arithmetic operand
                _, aop, a2, b2 = x
                af = {"+": pc.add, "-": pc.subtract,
                      "*": pc.multiply}[aop]
                return af(*(_numeric_col(t.column(y.value))
                            if y.kind == "var" else float(y.value)
                            for y in (a2, b2)))
            return pc.cast(pc.utf8_length(t.column(x[1])),
                           pa.float64())  # strlen (codepoints)
        if x.kind == "var":
            col = t.column(x.value)
            return _numeric_col(col) if numeric else col
        if x.kind == "num":
            return float(x.value)
        return x.value

    ops = {"=": pc.equal, "!=": pc.not_equal, "<": pc.less,
           "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal}
    return ops[op](operand(left), operand(right))


def _composite_join(left, right, shared: list[str],
                    join_type: str = "inner"):
    from k_gap_ray.dsutil import join_datasets

    def key_keep(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            *[t.column(v) for v in shared], _SEP)
        return t.append_column("__jk", k)

    def key_drop(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            *[t.column(v) for v in shared], _SEP)
        t = t.drop_columns(shared)
        return t.append_column("__jk", k)

    j = join_datasets(
        left.map_batches(key_keep, batch_format="pyarrow"),
        right.map_batches(key_drop, batch_format="pyarrow"),
        on="__jk", join_type=join_type,
        scrub_left=False, scrub_right=False)
    return j.map_batches(lambda t: t.drop_columns(["__jk"]),
                         batch_format="pyarrow")


def _join_plans(plan, bound: list[str], ds, pvars: list[str],
                join_type: str = "inner"):
    """Join a sub-plan into the running plan on their shared variables;
    returns (plan, bound)."""
    from k_gap_ray.dsutil import join_datasets

    shared = [v for v in bound if v in pvars]
    if not shared:
        raise ValueError(
            "disconnected pattern (cartesian product) not supported")
    if len(shared) == 1:
        plan = join_datasets(plan, ds, on=shared[0], join_type=join_type,
                             scrub_left=False, scrub_right=False)
    else:
        plan = _composite_join(plan, ds, shared, join_type=join_type)
    return plan, bound + [v for v in pvars if v not in bound]


def _apply_filters(plan, filters: list[tuple]):
    filters = list(filters)

    def apply(t: pa.Table) -> pa.Table:
        mask = None
        for e in filters:
            m = _eval(e, t)
            mask = m if mask is None else pc.and_(mask, m)
        return t.filter(mask)

    return plan.map_batches(apply, batch_format="pyarrow")


def _empty_plan(all_vars: list[str]):
    """Typed zero-row plan with the group's variable columns (sorted
    for a stable order across UNION branches)."""
    import ray.data as rd

    return rd.from_arrow(pa.table(
        {v: pa.array([], pa.string()) for v in sorted(all_vars)}))


#: pattern-scan row cap for the broadcast (driver-side pyarrow) join;
#: scans above it take the distributed Ray hash-join path. Kept small
#: because pa.Table.join rebuilds the right-side hash index PER LEFT
#: BATCH — measured at sf0.1: broadcasting a ~200k-row path* closure
#: took q_sparql_docs_star from 17 s to 107 s, while broadcasting the
#: typical selective scan (hundreds of rows) cuts whole-query time
#: 20-40% by removing the per-join pipeline drain
_BCAST_JOIN_CAP = 32_000


def _broadcast_join(plan, right_ref, keys: list[str], join_type: str):
    """Join a LAZY plan against a small broadcast Arrow table inside
    map_batches (pa.Table.join per batch — correct for any batch
    boundary because the whole right side is visible to every batch).
    Unlike Ray's hash join this streams, needs no pre-drain of the
    left side, and tolerates empty inputs — which removes the
    materialize().count() probe per join that was the engine's
    biggest structural scale-tax (round-3 verdict)."""

    def f(t: pa.Table, _ref=right_ref, _k=tuple(keys),
          _jt=join_type) -> pa.Table:
        import ray as _r

        return t.join(_r.get(_ref), keys=list(_k), join_type=_jt)

    return plan.map_batches(f, batch_format="pyarrow")


def _build_group(quads, patterns: list[Pattern], filters: list[tuple],
                 meta_vars: frozenset = frozenset()):
    """Join a basic graph pattern's scans; returns (plan, bound vars).

    Any scan with ZERO matches short-circuits the whole group to a
    typed empty plan (inner joins make the group empty, and Ray 2.49's
    hash join crashes outright when one side is fully empty).

    Join strategy: pattern scans at or below _BCAST_JOIN_CAP rows are
    collected once and joined as BROADCAST pyarrow joins — the plan
    stays one lazy map_batches chain with a single drain at the end of
    the group, instead of a materialize().count() probe per join
    (an n-pattern BGP used to pay n pipeline drains). Oversized scans
    fall back to the distributed Ray hash join, which reinstates the
    probe-and-scrub discipline around that join only."""
    import ray

    from k_gap_ray.dsutil import drop_empty_blocks

    plan, bound = None, []
    plan_cols: list[str] = []
    for pat in patterns:
        # materialized per scan: joining two LAZY scans of the same
        # materialized parent silently yields 0 rows on Ray 2.49 (the
        # slim var projections are cheap to pin). Scrubbed too: a
        # zero-row scan block reaching a hash-join partition alone
        # crashes the per-partition pyarrow join (observed with the
        # many-tiny-block closure scans behind path+ patterns); the
        # scrub is ref-iteration only on an already-materialized ds.
        if pat.p.kind.startswith("path"):
            builder = {"path+": _path_plus, "path*": _path_star,
                       "path?": _path_opt}[pat.p.kind]
            clo = builder(quads, pat.p.value,
                          graph=pat.g.value if pat.g else None)
            ds = None if clo is None else \
                (clo.map_batches(_make_pair_scan(pat),
                                 batch_format="pyarrow")
                 .materialize())
        else:
            ds = _pattern_source(quads, pat, meta_vars) \
                .map_batches(_make_scan(pat, meta_vars),
                             batch_format="pyarrow",
                             zero_copy_batch=True).materialize()
        if ds is None or ds.count() == 0:
            all_vars = {v for pt in patterns for v in pt.vars()}
            return _empty_plan(list(all_vars)), sorted(all_vars), True
        n_scan = ds.count()
        ds = drop_empty_blocks(ds)
        if plan is None:
            # coalesce the seed: scans inherit the quads' many tiny
            # blocks, and every broadcast join downstream pays one
            # right-index build PER LEFT BLOCK — a slim-stream
            # repartition here is far cheaper than that
            n_blocks = ds.num_blocks()
            if n_blocks > 32 and n_scan <= 4_000_000:
                ds = ds.repartition(max(8, min(32, n_scan // 4096 + 1))) \
                    .materialize()
            plan, bound = ds, list(pat.vars())
            plan_cols = list(ds.schema().names)
            continue
        shared = [v for v in bound if v in pat.vars()]
        if not shared:
            raise ValueError(
                "disconnected pattern (cartesian product) not supported")
        if n_scan <= _BCAST_JOIN_CAP:
            rt = pa.concat_tables(
                [p for p in ray.get(ds.to_arrow_refs()) if p.num_rows]
            ).combine_chunks()
            # a var bound by BOTH sides outside the keys (e.g. the
            # same obj var's __pplang projection): keep the left copy
            dup = [c for c in rt.column_names
                   if c not in shared and c in plan_cols]
            if dup:
                rt = rt.drop_columns(dup)
            plan = _broadcast_join(plan, ray.put(rt), shared, "inner")
            bound += [v for v in pat.vars() if v not in bound]
            plan_cols += [c for c in rt.column_names
                          if c not in plan_cols]
        else:
            # distributed path: Ray's hash join crashes on an empty
            # side, so drain-and-probe around this join only
            plan = drop_empty_blocks(plan.materialize())
            if plan.count() == 0:
                all_vars = {v for pt in patterns for v in pt.vars()}
                return _empty_plan(list(all_vars)), sorted(all_vars), True
            plan, bound = _join_plans(plan, bound, ds, pat.vars())
            plan = plan.materialize()
            if plan.count() == 0:
                all_vars = {v for pt in patterns for v in pt.vars()}
                return _empty_plan(list(all_vars)), sorted(all_vars), True
            plan = drop_empty_blocks(plan)
            plan_cols = list(plan.schema().names)
    if filters:
        plan = _apply_filters(plan, filters)
    # ONE drain for the whole group: the empty contract for callers +
    # the scrub the caller's next hash join needs
    plan = plan.materialize()
    if plan.count() == 0:
        all_vars = {v for pt in patterns for v in pt.vars()}
        return _empty_plan(list(all_vars)), sorted(all_vars), True
    return drop_empty_blocks(plan), bound, False


def _require_graph_column(quads, q: SparqlQuery) -> None:
    """GRAPH-scoped queries need a ``graph`` column on the input quad
    Dataset — fail with a contract ValueError, not a mid-execution
    Arrow KeyError."""
    groups = [q.patterns, q.construct] \
        + [p for p, _ in q.optionals] + [p for p, _ in q.unions] \
        + [p for p, _ in q.not_exists] + [p for p, _ in q.minus] \
        + [p for p, _ in q.exists]
    if any(pat.g is not None for pats in groups for pat in pats):
        names = quads.schema().names
        if "graph" not in names:
            raise ValueError(
                "GRAPH clause needs a 'graph' column on the quads "
                f"Dataset (has: {names})")


def _require_lang_column(quads, q: SparqlQuery) -> None:
    """Term-metadata functions (LANG / isLiteral / DATATYPE) need
    their source column on the input quad Dataset — fail with a
    contract ValueError up front."""
    names = quads.schema().names
    for fname, mvars, src in (
            ("LANG()", q.lang_vars, "obj_lang"),
            ("isLiteral()/isIRI()", q.lit_vars, "obj_is_literal"),
            ("DATATYPE()", q.dt_vars, "obj_datatype")):
        if mvars and src not in names:
            raise ValueError(
                f"{fname} needs an '{src}' column on the quads "
                f"Dataset (has: {names})")


def _solution_plan(quads, q: SparqlQuery):
    """Build the solution-sequence plan (pattern joins, UNION,
    OPTIONAL, filters, NOT EXISTS anti-joins) shared by SELECT and
    CONSTRUCT; returns (plan, bound vars)."""
    from k_gap_ray.dsutil import drop_empty_blocks

    # full-text-search magic predicates (the reference's
    # luc:searchIndex idiom): rewrite + virtual match rows, then the
    # rest of the planner is unchanged (k_gap_ray/sparql_fts.py)
    if any(p.p.kind == "iri" and p.p.value.startswith("urn:kgap:fts:")
           for p in q.patterns):
        from k_gap_ray.sparql_fts import rewrite_fts

        if _is_store(quads):
            # the FTS rewrite appends virtual match quads to the
            # Dataset itself — fall back to the full-store Dataset
            quads = drop_empty_blocks(quads.full().materialize())
        quads, q = rewrite_fts(quads, q)

    if q.unions:
        # bag union of the branch plans (== SQL UNION ALL); branches
        # bind the same vars (validated), project to one column order;
        # empty branches contribute nothing and are skipped (their
        # zero-row blocks would bypass the projection map and crash
        # downstream joins with the wrong schema)
        order = sorted({v for pat in q.unions[0][0] for v in pat.vars()
                        if not v.startswith(_INTERNAL)})
        branches = []
        for pats, flts in q.unions:
            b, _, b_empty = _build_group(quads, pats, flts,
                                         q.meta_specs())
            if not b_empty:
                branches.append(b.map_batches(
                    lambda t, o=tuple(order): t.select(list(o)),
                    batch_format="pyarrow"))
        plan_empty = not branches
        plan = _empty_plan(order) if plan_empty \
            else branches[0].union(*branches[1:])
        bound = list(order)
    elif not q.patterns and q.subqueries:
        # subquery-only WHERE body (aggregate-of-aggregates idiom):
        # the first subquery IS the base relation
        sub0 = q.subqueries[0]
        plan = sparql_select(quads, sub0).materialize()
        bound = list(sub0.group_by) + [a for _, _, a in sub0.aggs]
        plan_empty = plan.count() == 0
        plan = _empty_plan(bound) if plan_empty else drop_empty_blocks(plan)
    else:
        plan, bound, plan_empty = _build_group(quads, q.patterns, [],
                                               q.meta_specs())
    # IF binds run after the OPTIONAL joins (they reference optional
    # vars via BOUND); concat/term binds keep their pre-OPTIONAL slot
    pre_binds = [b for b in q.binds if b[1][0] not in ("if", "coalesce")]
    post_binds = [b for b in q.binds if b[1][0] in ("if", "coalesce")]
    if pre_binds and not plan_empty:
        binds = list(pre_binds)

        def apply_binds(t: pa.Table) -> pa.Table:
            for v, expr in binds:
                if expr[0] == "strfn":
                    t = t.append_column(
                        v, _strfn_array(expr[1], expr[2], t))
                    continue
                if expr[0] in ("arith", "numfn"):
                    t = t.append_column(v, _numbind_array(expr, t))
                    continue
                terms = expr[1] if expr[0] == "concat" else [expr[1]]
                parts = [t.column(x.value) if x.kind == "var"
                         else pa.scalar(x.value, pa.string())
                         for x in terms]
                col = parts[0] if len(parts) == 1 and expr[0] != "concat" \
                    else pc.binary_join_element_wise(*parts, "")
                if not isinstance(col, (pa.Array, pa.ChunkedArray)):
                    # all-literal expression folds to one constant
                    const = "".join(x.value for x in terms)
                    col = pa.array([const] * t.num_rows, pa.string())
                t = t.append_column(v, col)
            return t

        plan = plan.map_batches(apply_binds, batch_format="pyarrow")
    if pre_binds:
        bound = bound + [v for v, _ in pre_binds]
    # aggregate subqueries: each runs as its own SELECT (recursive —
    # validated non-nesting), then inner-joins the plan on its GROUP
    # BY variables; grouped-aggregate results are small, so the
    # broadcast path is the norm. Runs BEFORE the OPTIONAL left joins
    # (inner ⋈ then left ⟕ == the SQL mirror's join order).
    sub_queries = q.subqueries if q.patterns or q.unions \
        else q.subqueries[1:]  # [0] already consumed as the base
    for sub_q in sub_queries:
        sub_vis = list(sub_q.group_by) + [a for _, _, a in sub_q.aggs]
        shared = [v for v in bound if v in sub_q.group_by]
        if not shared:
            raise ValueError(
                "subquery shares no GROUP BY variable with the outer "
                "group (cartesian product not supported)")
        new = [v for v in sub_vis if v not in bound]
        if plan_empty:
            bound = bound + new
            continue
        sub_res = sparql_select(quads, sub_q).materialize()
        n_sub = sub_res.count()
        if n_sub == 0:
            plan = plan.limit(0)  # inner join against nothing
            plan_empty = True
            bound = bound + new
            continue
        if n_sub <= _BCAST_JOIN_CAP:
            import ray as _ray
            rt = pa.concat_tables(
                [b for b in _ray.get(sub_res.to_arrow_refs())
                 if b.num_rows]).combine_chunks()
            plan = _broadcast_join(plan, _ray.put(rt), shared, "inner")
        else:
            # oversized aggregate result: distributed hash join with
            # the drain-probe-scrub discipline on both sides
            sub_res = drop_empty_blocks(sub_res)
            plan = plan.materialize()
            if plan.count() == 0:
                plan_empty = True
                bound = bound + new
                continue
            plan = drop_empty_blocks(plan)
            plan, _ = _join_plans(plan, bound, sub_res, sub_vis,
                                  join_type="inner")
        bound = bound + new
    for pats, flts in q.optionals:
        sub, sub_bound, sub_empty = _build_group(quads, pats, flts,
                                                 q.meta_specs())
        new = [v for v in sub_bound if v not in bound]
        if plan_empty:
            bound = bound + new  # still zero rows; columns moot
            continue
        if sub_empty:
            # LEFT JOIN with an empty right: keep every plan row and
            # null-fill the optional vars (the join itself would crash
            # on the fully-empty side)
            plan = plan.map_batches(
                lambda t, nv=tuple(new): pa.table(
                    {**{c: t.column(c) for c in t.column_names},
                     **{v: pa.nulls(t.num_rows, pa.string())
                        for v in nv}}),
                batch_format="pyarrow")
            bound = bound + new
            continue
        # small sub-group (the common case — _build_group returns it
        # materialized+scrubbed, so count() is free): BROADCAST
        # left-outer join inside map_batches. Correct per batch (the
        # whole right side is visible to every left batch), keeps the
        # plan one lazy chain, and — unlike Ray's hash join — is
        # immune to the schema-less empty blocks a PREVIOUS left-outer
        # join emits (chained OPTIONALs crashed the distributed join
        # with ArrowInvalid before this path existed).
        if sub.count() <= _BCAST_JOIN_CAP:
            import ray as _ray
            rt = pa.concat_tables(
                [p for p in _ray.get(sub.to_arrow_refs()) if p.num_rows]
            ).combine_chunks()
            shared = [v for v in bound if v in sub_bound]
            if not shared:
                raise ValueError("disconnected pattern (cartesian "
                                 "product) not supported")
            plan = _broadcast_join(plan, _ray.put(rt), shared,
                                   "left outer")
            bound = bound + new
            continue
        # oversized sub-group: distributed hash join, which needs the
        # drain-probe-scrub discipline on the (possibly join-descended)
        # left side
        plan = plan.materialize()
        if plan.count() == 0:
            plan_empty = True
            bound = bound + new
            continue
        plan = drop_empty_blocks(plan)
        plan, bound = _join_plans(plan, bound, sub, sub_bound,
                                  join_type="left_outer")
    if post_binds:
        if not plan_empty:
            pb = list(post_binds)

            def apply_if_binds(t: pa.Table) -> pa.Table:
                for v, expr in pb:
                    def val(x):
                        return t.column(x.value) if x.kind == "var" \
                            else pa.scalar(x.value, pa.string())

                    if expr[0] == "coalesce":
                        col = pc.coalesce(*[val(x) for x in expr[1]])
                        if not isinstance(col, (pa.Array,
                                                pa.ChunkedArray)):
                            col = pa.array([col.as_py()] * t.num_rows,
                                           pa.string())
                        t = t.append_column(v, col)
                        continue
                    _, cond, tt, te = expr
                    # null cond (comparison on an unmatched optional
                    # var) selects `else`, matching SQL CASE WHEN
                    mask = pc.fill_null(_eval(cond, t), False)
                    col = pc.if_else(mask, val(tt), val(te))
                    if not isinstance(col, (pa.Array, pa.ChunkedArray)):
                        col = pa.array([col.as_py()] * t.num_rows,
                                       pa.string())
                    t = t.append_column(v, col)
                return t

            plan = plan.map_batches(apply_if_binds,
                                    batch_format="pyarrow")
        bound = bound + [v for v, _ in post_binds]
    # top-level filters run after OPTIONAL joins: a comparison on an
    # unmatched (null) optional var is null → dropped, matching SQL
    if q.filters and not plan_empty:
        plan = _apply_filters(plan, q.filters)
        if q.not_exists or q.minus or q.exists:
            # a filter-emptied plan would crash the marker joins below
            plan = plan.materialize()
            if plan.count() == 0:
                plan_empty = True
            else:
                plan = drop_empty_blocks(plan)
    semi_groups = ([("ne", g) for g in q.not_exists]
                   + [("minus", g) for g in q.minus]
                   + [("exists", g) for g in q.exists])
    first_semi_done = False
    for kind, (pats, flts) in semi_groups:
        # correlated semi/anti-join: the sub-plan is deduped to the
        # DISTINCT shared-var tuples (EXISTS semantics — no row
        # multiplication), marker-joined left-outer; null-marker rows
        # survive an anti-join (NOT EXISTS / MINUS), matched-marker
        # rows survive a semi-join (EXISTS).
        if plan_empty:
            break  # nothing to filter
        sub, sub_bound, sub_empty = _build_group(quads, pats, flts,
                                                 q.meta_specs())
        shared = [v for v in bound if v in sub_bound]
        if kind == "minus" and not shared:
            continue  # MINUS sharing no variable removes nothing (spec)
        if sub_empty:
            if kind == "exists":
                plan = plan.limit(0)  # semi-join vs nothing: empty
                plan_empty = True
            continue  # anti-join vs nothing: every plan row survives
        marker = (sub.map_batches(
            lambda t, s=tuple(shared): t.select(list(s)),
            batch_format="pyarrow")
            .groupby(shared).count()
            .map_batches(
                lambda t, s=tuple(shared): pa.table(
                    {**{v: t.column(v) for v in s},
                     "__ne": pa.array([1] * t.num_rows, pa.int64())}),
                batch_format="pyarrow"))
        # the marker descends from a sort-based groupby -> can carry
        # empty-SCHEMA zero-row blocks that crash the hash join; scrub
        marker = marker.materialize()
        if marker.count() == 0:  # sub-plan filtered to nothing
            if kind == "exists":
                plan = plan.limit(0)
                plan_empty = True
            continue
        marker = drop_empty_blocks(marker)
        if first_semi_done:
            # the plan now descends from a previous marker join +
            # filter: scrub its zero-row empty-schema blocks (and
            # catch a fully-emptied plan) before the next hash join
            plan = plan.materialize()
            if plan.count() == 0:
                plan_empty = True
                break
            plan = drop_empty_blocks(plan)
        first_semi_done = True
        if len(shared) == 1:
            from k_gap_ray.dsutil import join_datasets
            plan = join_datasets(plan, marker, on=shared[0],
                                 join_type="left_outer",
                                 scrub_left=False, scrub_right=False)
        else:
            plan = _composite_join(plan, marker, shared,
                                   join_type="left_outer")
        keep_null = kind != "exists"
        plan = plan.map_batches(
            lambda t, kn=keep_null: t.filter(
                pc.is_null(t.column("__ne")) if kn
                else pc.is_valid(t.column("__ne")))
            .drop_columns(["__ne"]),
            batch_format="pyarrow")
    return plan, bound


def sparql_select(quads, query: str | SparqlQuery):
    """Execute a SPARQL SELECT (subset) over a quads Dataset with
    columns subj/pred/obj (extra columns ignored). Returns a Dataset
    (or pa.Table when LIMIT pagination cuts at the driver edge) whose
    columns are the selected variable names."""
    from k_gap_ray.dsutil import drop_empty_blocks

    q = parse_sparql(query) if isinstance(query, str) else query
    if q.construct:
        raise ValueError("use sparql_construct for CONSTRUCT queries")
    if q.ask:
        raise ValueError("use sparql_ask for ASK queries")
    if q.describe:
        raise ValueError("use sparql_describe for DESCRIBE queries")
    # one materialize, N pattern scans — also scrubs groupby-produced
    # empty-schema blocks (dedup_quads output is a common input here).
    # A QuadStore skips the drain: its scans are bucket-pruned disk
    # reads, never shuffle products, so there is nothing to scrub.
    if not _is_store(quads):
        quads = drop_empty_blocks(quads.materialize())
    _require_graph_column(quads, q)
    _require_lang_column(quads, q)
    plan, bound = _solution_plan(quads, q)

    # statically-known non-string bindings: subquery aggregate aliases
    # (COUNT->int64, SUM/AVG->float64; MIN/MAX/CONCAT stay string) —
    # the driver-edge schema builders below must not stringify them
    static_types = {}
    for sub in q.subqueries:
        for fn, _, a in sub.aggs:
            static_types[a] = (
                pa.int64() if fn in ("COUNT", "COUNT_DISTINCT")
                else pa.float64() if fn in ("SUM", "AVG")
                else pa.string())

    if q.aggs:
        if q.aggs[0][0] == "GROUP_CONCAT":
            # values concatenated in SORTED order (deterministic on
            # both backends; SQL mirror: string_agg(... ORDER BY ...));
            # validated as the ONLY aggregate (map_groups path)
            _, avar, alias = q.aggs[0]
            sep = q.agg_sep
            gb = list(q.group_by)

            def concat_group(t: pa.Table) -> pa.Table:
                vals = sorted(t.column(avar).to_pylist())
                row = {g: [t.column(g)[0].as_py()] for g in gb}
                row[alias] = [sep.join(vals)]
                return pa.table(row)

            plan = plan.groupby(gb or None).map_groups(
                concat_group, batch_format="pyarrow")
            if not gb:  # global: a single one-row result
                return pa.Table.from_pylist(
                    plan.take_all(),
                    schema=pa.schema([(alias, pa.string())]))
        elif q.aggs[0][0] == "COUNT_DISTINCT":
            # COUNT(DISTINCT ?x): distinct (group, x) pairs first
            # (one groupby), then a row count per group — the same
            # two-stage shape as relational.q_count_distinct;
            # validated as the ONLY aggregate
            _, avar, alias = q.aggs[0]
            gb = list(q.group_by)
            if not gb:  # global: number of distinct bindings
                n = (plan.map_batches(
                        lambda t, c=avar: t.select([c]),
                        batch_format="pyarrow")
                     .groupby(avar).count().count())
                return pa.table({alias: pa.array([n], pa.int64())})
            distinct = (plan.map_batches(
                            lambda t, cols=tuple(gb + [avar]):
                            t.select(list(cols)),
                            batch_format="pyarrow")
                        .groupby(gb + [avar]).count()
                        .select_columns(gb + [avar]))
            # scrub between consecutive groupbys (empty-schema blocks
            # out of groupby #1 survive the select and can poison the
            # second shuffle — BENCH/NOTES.md join/marker rule)
            distinct = drop_empty_blocks(distinct.materialize())
            plan = (distinct.groupby(gb).count()
                    .rename_columns({"count()": alias}))
        else:
            # any mix of COUNT/SUM/AVG/MIN/MAX in ONE grouped pass.
            # SUM/AVG coerce string-stored values via the TRY_CAST
            # mirror (_numeric_col) — non-numeric become null and are
            # skipped on BOTH backends; integer inputs keep SUM exact
            # and AVG bit-identical (exact sum / exact count per side).
            from ray.data.aggregate import Count, Max, Mean, Min, Sum

            num_vars = sorted({avar for fn, avar, _ in q.aggs
                               if fn in ("SUM", "AVG")})
            if num_vars:
                plan = plan.map_batches(
                    lambda t, nv=tuple(num_vars): pa.table(
                        {**{c: t.column(c) for c in t.column_names},
                         **{f"__pnum_{a}": _numeric_col(t.column(a))
                            for a in nv}}),
                    batch_format="pyarrow")
            agg_objs = []
            for fn, avar, alias in q.aggs:
                if fn == "COUNT":
                    # required var -> COUNT == row count; on=avar
                    # because Ray 2.49's no-column Count() returns 0
                    # in a GLOBAL Dataset.aggregate (grouped is fine)
                    agg_objs.append(Count(on=avar, alias_name=alias))
                elif fn == "SUM":
                    agg_objs.append(Sum(f"__pnum_{avar}",
                                        alias_name=alias))
                elif fn == "AVG":
                    agg_objs.append(Mean(f"__pnum_{avar}",
                                         alias_name=alias))
                else:  # MIN/MAX (string collation, same on both sides);
                    # SAMPLE is pinned to MIN — SPARQL leaves the pick
                    # undefined, so both backends take the smallest
                    # value for cross-engine determinism
                    cls = Max if fn == "MAX" else Min
                    agg_objs.append(cls(avar, alias_name=alias))
            def _alias_type(fn: str, avar: str):
                # MIN/MAX/SAMPLE keep their input's type: string for
                # pattern vars, the static type for subquery aliases
                if fn == "COUNT":
                    return pa.int64()
                if fn in ("SUM", "AVG"):
                    return pa.float64()
                return static_types.get(avar, pa.string())

            if not q.group_by:
                plan = plan.materialize()
                if plan.count() == 0:
                    # global aggregates over no rows: COUNT=0, others
                    # null — the SQL result shape
                    return pa.table({
                        alias: pa.array(
                            [0 if fn == "COUNT" else None],
                            _alias_type(fn, avar))
                        for fn, avar, alias in q.aggs})
                row = plan.aggregate(*agg_objs)
                return pa.table({
                    alias: pa.array([row[alias]],
                                    _alias_type(fn, avar))
                    for fn, avar, alias in q.aggs})
            plan = plan.groupby(q.group_by).aggregate(*agg_objs)
        if q.having:
            # post-aggregation filter: aggregate aliases are numeric
            # columns, coerced by the same _numeric_col/TRY_CAST
            # mirror as ordinary filters
            plan = _apply_filters(plan, q.having)
        out_vars = list(q.group_by) + [a for _, _, a in q.aggs]
    else:
        out_vars = q.select_vars or [v for v in bound
                                     if not v.startswith(_INTERNAL)]
        plan = plan.map_batches(lambda t: t.select(out_vars),
                                batch_format="pyarrow")
        if q.distinct:
            plan = (plan.groupby(out_vars).count().select_columns(out_vars))
    if q.order_by:
        keys = [v for v, _ in q.order_by]
        desc = [not asc for _, asc in q.order_by]
        plan = plan.sort(keys, descending=desc)
    if q.limit is not None:
        head = plan.limit(q.offset + q.limit).take_all()
        # COUNT aliases are int64, SUM/AVG float64, MIN/MAX keep their
        # input's type (string except over a subquery alias); plain
        # vars stay string except statically-typed subquery aliases
        atypes = {alias: {"COUNT": pa.int64(),
                          "COUNT_DISTINCT": pa.int64(),
                          "SUM": pa.float64(),
                          "AVG": pa.float64()}.get(
                              fn, static_types.get(avar))
                  for fn, avar, alias in q.aggs}
        return pa.Table.from_pylist(
            head[q.offset:], schema=pa.schema(
                [(v, atypes.get(v) or static_types.get(v)
                  or pa.string())
                 for v in out_vars]))
    return plan


def sparql_ask(quads, query: str | SparqlQuery) -> bool:
    """Execute a SPARQL ASK (J4 existence test): True iff the WHERE
    body has at least one solution. The plan stops at the first
    surviving row (``limit(1)``) — the engine never materializes the
    solution set. DuckDB oracle: :func:`sparql_ask_to_sql`."""
    from k_gap_ray.dsutil import drop_empty_blocks

    q = parse_sparql(query) if isinstance(query, str) else query
    if not q.ask:
        raise ValueError("sparql_ask needs an ASK query")
    if not _is_store(quads):
        quads = drop_empty_blocks(quads.materialize())
    _require_graph_column(quads, q)
    _require_lang_column(quads, q)
    plan, _ = _solution_plan(quads, q)
    return plan.limit(1).count() > 0


def sparql_ask_to_sql(query: str | SparqlQuery,
                      quads_rel: str = "quads") -> str:
    """Compile an ASK query to ``SELECT EXISTS(...) AS ask`` — the
    independent oracle backend for :func:`sparql_ask`."""
    q = parse_sparql(query) if isinstance(query, str) else query
    if not q.ask:
        raise ValueError("sparql_ask_to_sql needs an ASK query")
    from_sql, _, conds = _solution_sql_parts(q, quads_rel)
    inner = "SELECT 1 FROM " + from_sql
    if conds:
        inner += "\nWHERE " + " AND ".join(conds)
    return f"SELECT EXISTS ({inner}) AS ask"


def sparql_construct(quads, query: str | SparqlQuery):
    """Execute a SPARQL CONSTRUCT (subset) over a quads Dataset:
    instantiate every template triple for every solution, drop
    instantiations with an unbound (null OPTIONAL) variable, and
    return the DISTINCT (subj, pred, obj) triple Dataset — a graph is
    a set. The M6 vocabulary-remap operator expressed as a query."""
    from ray.data.aggregate import Min

    from k_gap_ray.dsutil import drop_empty_blocks

    q = parse_sparql(query) if isinstance(query, str) else query
    if not q.construct:
        raise ValueError("sparql_construct needs a CONSTRUCT query")
    if not _is_store(quads):
        quads = drop_empty_blocks(quads.materialize())
    _require_graph_column(quads, q)
    _require_lang_column(quads, q)
    plan, _ = _solution_plan(quads, q)
    templates = list(q.construct)

    def emit(t: pa.Table) -> pa.Table:
        outs = []
        for tp in templates:
            cols: dict = {}
            mask = None
            for name, term in (("subj", tp.s), ("pred", tp.p),
                               ("obj", tp.o)):
                if term.kind == "var":
                    col = t.column(term.value)
                    m = pc.is_valid(col)
                    mask = m if mask is None else pc.and_(mask, m)
                    cols[name] = pc.cast(col, pa.string())
                else:
                    cols[name] = pa.array([term.value] * t.num_rows,
                                          pa.string())
            tb = pa.table(cols)
            if mask is not None:
                tb = tb.filter(mask)
            outs.append(tb)
        return pa.concat_tables(outs)

    tri = plan.map_batches(emit, batch_format="pyarrow")
    # distinct triple set via ONE composite-key groupby (the key
    # determines all three columns, so Min reconstructs them)
    keyed = tri.map_batches(
        lambda t: t.append_column("__k", pc.binary_join_element_wise(
            t.column("subj"), t.column("pred"), t.column("obj"), _SEP)),
        batch_format="pyarrow")
    ded = keyed.groupby("__k").aggregate(
        Min("subj", alias_name="subj"), Min("pred", alias_name="pred"),
        Min("obj", alias_name="obj"))
    return ded.map_batches(lambda t: t.select(["subj", "pred", "obj"]),
                           batch_format="pyarrow")


def sparql_describe(quads, query: str | SparqlQuery,
                    resource_cap: int = 1_000_000):
    """Execute a SPARQL DESCRIBE (subset) over a quads Dataset — the
    fourth query form next to SELECT/CONSTRUCT/ASK (GraphDB serves all
    four, docs/components/graphdb.md). The description of a resource
    set R is the DISTINCT (subj, pred, obj) triples where subj ∈ R, or
    obj ∈ R and the object is not a literal — a symmetric description
    without blank-node closure, pinned because the spec leaves
    DESCRIBE's shape implementation-defined and this one is
    deterministic and SQL-mirrorable (:func:`sparql_describe_to_sql`).

    R = the constant IRIs plus the DISTINCT bindings of each DESCRIBE
    variable from the WHERE body. R is collected to the driver and
    broadcast into the quad filter (DESCRIBE is a point-lookup
    surface; ``resource_cap`` guards the collect — above it, wire a
    semi-join on subj/obj instead)."""
    import ray
    from ray.data.aggregate import Min

    from k_gap_ray.dsutil import drop_empty_blocks

    q = parse_sparql(query) if isinstance(query, str) else query
    if not q.describe:
        raise ValueError("sparql_describe needs a DESCRIBE query")
    if "obj_is_literal" not in quads.schema().names:
        raise ValueError("DESCRIBE needs the obj_is_literal column to "
                         "tell IRI objects from literals")
    store = quads if _is_store(quads) else None
    if store is None:
        quads = drop_empty_blocks(quads.materialize())
    res: set = {t.value for t in q.describe if t.kind == "iri"}
    dvars = [t.value for t in q.describe if t.kind == "var"]
    if dvars:
        _require_graph_column(quads, q)
        _require_lang_column(quads, q)
        plan, _ = _solution_plan(quads, q)
        for dv in dvars:
            vals = (plan.map_batches(lambda t, c=dv: t.select([c]),
                                     batch_format="pyarrow")
                    .groupby(dv).count().take(resource_cap + 1))
            if len(vals) > resource_cap:
                raise NotImplementedError(
                    f"DESCRIBE ?{dv} binds more than {resource_cap} "
                    "resources; wire the distributed semi-join path")
            res.update(r[dv] for r in vals if r[dv] is not None)
    rs_ref = ray.put(pa.array(sorted(res), pa.string()))

    def pick(t: pa.Table, _ref=rs_ref) -> pa.Table:
        import ray as _r

        rs = _r.get(_ref)
        m = pc.is_in(t.column("subj"), value_set=rs)
        nonlit = pc.invert(pc.cast(t.column("obj_is_literal"),
                                   pa.bool_()))
        m = pc.or_(m, pc.and_(nonlit,
                              pc.is_in(t.column("obj"), value_set=rs)))
        return t.select(["subj", "pred", "obj"]).filter(m)

    tri = (store.full() if store is not None else quads) \
        .map_batches(pick, batch_format="pyarrow")
    keyed = tri.map_batches(
        lambda t: t.append_column("__k", pc.binary_join_element_wise(
            t.column("subj"), t.column("pred"), t.column("obj"), _SEP)),
        batch_format="pyarrow")
    ded = keyed.groupby("__k").aggregate(
        Min("subj", alias_name="subj"), Min("pred", alias_name="pred"),
        Min("obj", alias_name="obj"))
    return ded.map_batches(lambda t: t.select(["subj", "pred", "obj"]),
                           batch_format="pyarrow")


def sparql_describe_to_sql(query: str | SparqlQuery,
                           quads_rel: str = "quads",
                           lead: str = "") -> str:
    """Compile a DESCRIBE query to the mirroring SQL: a MATERIALIZED
    resource-set CTE (constants UNION the DISTINCT bindings of each
    DESCRIBE variable — MATERIALIZED because it is referenced twice
    and DuckDB inlines plain CTEs per reference, BENCH/NOTES.md), then
    the symmetric subject-or-IRI-object triple filter. ``lead=","``
    appends the CTE to an existing WITH chain (docs-KG oracle)."""
    q = parse_sparql(query) if isinstance(query, str) else query
    if not q.describe:
        raise ValueError("sparql_describe_to_sql needs DESCRIBE")
    sels = []
    consts = [t.value for t in q.describe if t.kind == "iri"]
    if consts:
        vals = ", ".join(f"({_sql_str(c)})" for c in consts)
        sels.append(f"SELECT r FROM (VALUES {vals}) AS __c(r)")
    dvars = [t.value for t in q.describe if t.kind == "var"]
    if dvars:
        from_sql, outer_bind, conds = _solution_sql_parts(q, quads_rel)
        for dv in dvars:
            s = (f"SELECT DISTINCT {outer_bind[dv]} AS r\nFROM "
                 + from_sql)
            if conds:
                s += "\nWHERE " + " AND ".join(conds)
            sels.append(s)
    res_sql = "\nUNION\n".join(sels)
    head = (lead + "\n") if lead else "WITH "
    return (head + f"__res AS MATERIALIZED (\n{res_sql}\n)\n"
            + f"SELECT DISTINCT subj, pred, obj FROM {quads_rel}\n"
            + "WHERE subj IN (SELECT r FROM __res)\n"
            + "   OR (NOT obj_is_literal AND obj IN "
            + "(SELECT r FROM __res))")


# ---------------------------------------------------------------------------
# SQL backend (the oracle)
# ---------------------------------------------------------------------------


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _strfn_sql(fname: str, args: list, var_bind: dict[str, str]) -> str:
    """ANSI/DuckDB SQL for one BIND string function — the exact
    counterparts of :func:`_strfn_array`'s Arrow kernels (substr and
    strpos are 1-based and character-counted in DuckDB, matching the
    codepoint slicing on the Arrow side)."""
    a = var_bind[args[0].value] if args[0].kind == "var" \
        else _sql_str(args[0].value)
    if fname == "UCASE":
        return f"upper({a})"
    if fname == "LCASE":
        return f"lower({a})"
    if fname == "SUBSTR":
        if len(args) == 3:
            return f"substr({a}, {int(args[1].value)}, {int(args[2].value)})"
        return f"substr({a}, {int(args[1].value)})"
    if fname == "REPLACE":
        return (f"regexp_replace({a}, {_sql_str(args[1].value)}, "
                f"{_sql_str(args[2].value)}, 'g')")
    d = _sql_str(args[1].value)
    if fname == "STRBEFORE":
        return (f"(CASE WHEN strpos({a}, {d}) > 0 THEN "
                f"substr({a}, 1, strpos({a}, {d}) - 1) ELSE '' END)")
    # STRAFTER
    return (f"(CASE WHEN strpos({a}, {d}) > 0 THEN "
            f"substr({a}, strpos({a}, {d}) + length({d})) ELSE '' END)")


def _expr_sql(e: tuple, var_bind: dict[str, str]) -> str:
    tag = e[0]
    if tag == "or":
        return f"({_expr_sql(e[1], var_bind)} OR {_expr_sql(e[2], var_bind)})"
    if tag == "and":
        return (f"({_expr_sql(e[1], var_bind)} AND "
                f"{_expr_sql(e[2], var_bind)})")
    if tag == "in":  # VALUES inline data
        _, var, vals = e
        return (f"{var_bind[var]} IN ("
                + ", ".join(_sql_str(v) for v in vals) + ")")
    if tag == "in_tuple":  # multi-var VALUES: OR of per-row ANDs
        _, tvars, rows = e
        ors = ["(" + " AND ".join(
            f"{var_bind[v]} = {_sql_str(x)}" for v, x in zip(tvars, row))
            + ")" for row in rows]
        return "(" + " OR ".join(ors) + ")"
    if tag == "fn":
        _, name, var, lit = e
        if name == "REGEX":
            return f"regexp_matches({var_bind[var]}, {_sql_str(lit)})"
        fn = {"STRSTARTS": "starts_with",
              "STRENDS": "ends_with"}.get(name, "contains")
        return f"{fn}({var_bind[var]}, {_sql_str(lit)})"
    if tag == "not":
        return f"NOT ({_expr_sql(e[1], var_bind)})"
    if tag == "bound":
        return f"{var_bind[e[1]]} IS NOT NULL"
    if tag == "isliteral":  # BOOLEAN metadata column; NULL (unmatched
        # optional) drops the row like the engine's null mask
        return var_bind[_lit_col(e[1])]
    _, op, left, right = e
    sop = {"=": "=", "!=": "<>", "<": "<", "<=": "<=",
           ">": ">", ">=": ">="}[op]
    # a numeric literal (or STRLEN) on either side switches the
    # comparison numeric: var refs wrap in TRY_CAST — the SQL mirror
    # of the engine's _numeric_col coercion (failed parse → NULL →
    # row dropped on both backends)
    numeric = any(
        (isinstance(x, tuple) and x[0] in ("strlen", "arithx"))
        or (not isinstance(x, tuple) and x.kind == "num")
        for x in (left, right))

    def ref(x) -> str:
        if isinstance(x, tuple):
            if x[0] == "lang":
                return var_bind[_lang_col(x[1])]
            if x[0] == "dt":
                return var_bind[_dt_col(x[1])]
            if x[0] == "arithx":  # DOUBLE-domain arithmetic operand
                _, aop, a2, b2 = x
                parts = [f"TRY_CAST({var_bind[y.value]} AS DOUBLE)"
                         if y.kind == "var" else y.value
                         for y in (a2, b2)]
                return f"({parts[0]} {aop} {parts[1]})"
            return f"LENGTH({var_bind[x[1]]})"  # strlen (characters)
        if x.kind == "var":
            return f"TRY_CAST({var_bind[x.value]} AS DOUBLE)" \
                if numeric else var_bind[x.value]
        if x.kind == "num":
            return x.value
        return _sql_str(x.value)

    return f"{ref(left)} {sop} {ref(right)}"


def _group_sql(patterns: list[Pattern], filters: list[tuple],
               quads_rel: str,
               meta_vars: frozenset = frozenset()) -> tuple[str, list[str]]:
    """One basic graph pattern -> derived-table SQL selecting its
    variables as columns (plus ``__pp{kind}_{v}`` metadata projections
    for LANG()/isLiteral()/DATATYPE()-referenced vars bound at an
    object position here); returns (sql, vars in first-seen order)."""
    var_bind: dict[str, str] = {}
    conds: list[str] = []
    for i, pat in enumerate(patterns):
        if pat.o.kind == "var" and not pat.p.kind.startswith("path"):
            for kind, mv in sorted(meta_vars):
                if mv == pat.o.value:
                    colfn, src = _META_KINDS[kind]
                    var_bind[colfn(mv)] = f"t{i}.{src}"
        for term, col in pat.positions():
            ref = f"t{i}.{col}"
            if pat.p.kind.startswith("path") and col in ("pred", "graph"):
                continue  # closure derived table already restricted
                # (a var graph with a path modifier is rejected at parse)
            if term.kind == "var":
                if term.value in var_bind:
                    conds.append(f"{var_bind[term.value]} = {ref}")
                else:
                    var_bind[term.value] = ref
            elif term.kind.startswith("path"):
                continue  # unreachable (covered above); kept explicit
            elif term.kind in ("alt", "nalt"):
                in_list = ", ".join(_sql_str(p)
                                    for p in term.value.split(_SEP))
                neg = "NOT " if term.kind == "nalt" else ""
                conds.append(f"{ref} {neg}IN ({in_list})")
            else:
                conds.append(f"{ref} = {_sql_str(term.value)}")
    for e in filters:
        conds.append(_expr_sql(e, var_bind))
    out = list(var_bind)
    if not out:
        # all-constant group (canonical ASK): a valid one-column
        # relation whose ROW COUNT carries the existence answer
        sel = "SELECT 1 AS __const"
    else:
        sel = "SELECT " + ", ".join(f"{var_bind[v]} AS {v}" for v in out)

    def rel(i: int, pat: Pattern) -> str:
        if not pat.p.kind.startswith("path"):
            return f"{quads_rel} t{i}"
        # property-path relation: `+` is the transitive closure of the
        # pred edge set (several preds for an (p1|p2)+ alternative
        # step) via a recursive CTE (UNION = set semantics, terminates
        # on cycles); `*` seeds the same recursion with the zero-hop
        # identity over the graph's node set; `?` is identity UNION
        # the single-hop edges — the independent oracles for
        # _path_plus/_path_star/_path_opt
        preds = pat.p.value.split(_SEP)
        if len(preds) == 1:
            cond = f"pred = {_sql_str(preds[0])}"
        else:
            cond = "pred IN (" + ", ".join(_sql_str(p)
                                           for p in preds) + ")"
        gbase = "" if pat.g is None \
            else f" AND graph = {_sql_str(pat.g.value)}"
        gq = "" if pat.g is None \
            else f" AND q.graph = {_sql_str(pat.g.value)}"
        gnode = "" if pat.g is None \
            else f" WHERE graph = {_sql_str(pat.g.value)}"
        nodes = (f"(SELECT subj AS n FROM {quads_rel}{gnode} UNION "
                 f"SELECT obj FROM {quads_rel}{gnode})")
        if pat.p.kind == "path?":
            return (f"(SELECT n AS subj, '' AS pred, n AS obj "
                    f"FROM {nodes} UNION "
                    f"SELECT subj, '', obj FROM {quads_rel} "
                    f"WHERE {cond}{gbase}) t{i}")
        base = (f"SELECT n, n FROM {nodes}" if pat.p.kind == "path*"
                else f"SELECT subj, obj FROM {quads_rel} "
                     f"WHERE {cond}{gbase}")
        return (f"(WITH RECURSIVE __cl{i}(subj, obj) AS ("
                f"{base}"
                f" UNION "
                f"SELECT c.subj, q.obj FROM __cl{i} c JOIN {quads_rel} q"
                f" ON q.{cond}{gq} AND c.obj = q.subj)"
                f" SELECT subj, '' AS pred, obj FROM __cl{i}) t{i}")

    sql = (sel + " FROM " + ", ".join(rel(i, pat)
                                      for i, pat in enumerate(patterns)))
    if conds:
        sql += " WHERE " + " AND ".join(conds)
    return sql, out


def _solution_sql_parts(q: SparqlQuery, quads_rel: str):
    """Solution relation shared by SELECT and CONSTRUCT compilation:
    returns (from_sql, outer_bind var->column map, WHERE conds)."""
    if q.unions:
        order = sorted({v for pat in q.unions[0][0] for v in pat.vars()
                        if not v.startswith(_INTERNAL)})
        parts = []
        for i, (pats, flts) in enumerate(q.unions):
            g_sql, _ = _group_sql(pats, flts, quads_rel,
                                  q.meta_specs())
            parts.append("SELECT " + ", ".join(order)
                         + f" FROM ({g_sql}) u{i}")
        base_sql, base_vars = " UNION ALL ".join(parts), order
    elif not q.patterns and q.subqueries:
        # subquery-only WHERE body: the first subquery is the base
        # relation (mirrors _solution_plan)
        sub0 = q.subqueries[0]
        base_sql = sparql_to_sql(sub0, quads_rel)
        base_vars = list(sub0.group_by) + [a for _, _, a in sub0.aggs]
    else:
        base_sql, base_vars = _group_sql(q.patterns, [], quads_rel,
                                         q.meta_specs())
    outer_bind = {v: f"r.{v}" for v in base_vars}
    from_sql = f"({base_sql}) r"
    for v, expr in q.binds:
        if expr[0] in ("if", "coalesce"):
            continue  # these reference OPTIONAL vars: after joins
        if expr[0] == "strfn":
            outer_bind[v] = _strfn_sql(expr[1], expr[2], outer_bind)
            continue
        if expr[0] in ("arith", "numfn"):
            outer_bind[v] = _numbind_sql(expr, outer_bind)
            continue
        # args are required vars (validated) -> never NULL, so ||
        # concatenation matches Arrow's binary_join_element_wise
        terms = expr[1] if expr[0] == "concat" else [expr[1]]
        refs = [outer_bind[x.value] if x.kind == "var" else _sql_str(x.value)
                for x in terms]
        outer_bind[v] = "(" + " || ".join(refs) + ")"
    # aggregate subqueries: derived-table INNER JOINs on the shared
    # GROUP BY variables, placed before the OPTIONAL LEFT JOINs (the
    # join conditions reference only required-side bindings, so the
    # inner-then-left order equals the engine's plan order)
    sub_queries = q.subqueries if q.patterns or q.unions \
        else q.subqueries[1:]  # [0] already consumed as the base
    for i, sub_q in enumerate(sub_queries):
        sub_sql = sparql_to_sql(sub_q, quads_rel)
        shared = [v for v in outer_bind if v in sub_q.group_by]
        if not shared:
            raise ValueError(
                "subquery shares no GROUP BY variable with the outer "
                "group (cartesian product not supported)")
        on = " AND ".join(f"{outer_bind[v]} = sq{i}.{v}"
                          for v in shared)
        from_sql += f"\nJOIN (\n{sub_sql}\n) sq{i} ON {on}"
        for v in list(sub_q.group_by) + [a for _, _, a in sub_q.aggs]:
            outer_bind.setdefault(v, f"sq{i}.{v}")
    for i, (pats, flts) in enumerate(q.optionals):
        g_sql, g_vars = _group_sql(pats, flts, quads_rel,
                                   q.meta_specs())
        shared = [v for v in outer_bind if v in g_vars]
        if not shared:
            raise ValueError(
                "disconnected OPTIONAL (cartesian product) not supported")
        on = " AND ".join(f"{outer_bind[v]} = o{i}.{v}" for v in shared)
        from_sql += f"\nLEFT JOIN ({g_sql}) o{i} ON {on}"
        for v in g_vars:
            outer_bind.setdefault(v, f"o{i}.{v}")
    for v, expr in q.binds:
        if expr[0] not in ("if", "coalesce"):
            continue

        def _ref(x: Term) -> str:
            return outer_bind[x.value] if x.kind == "var" \
                else _sql_str(x.value)

        if expr[0] == "coalesce":
            outer_bind[v] = ("COALESCE("
                             + ", ".join(_ref(x) for x in expr[1]) + ")")
            continue
        # CASE WHEN: a NULL condition (comparison on an unmatched
        # optional var) selects ELSE, matching the engine's
        # fill_null(False) on the IF mask
        _, cond, tt, te = expr
        outer_bind[v] = (f"(CASE WHEN {_expr_sql(cond, outer_bind)} "
                         f"THEN {_ref(tt)} ELSE {_ref(te)} END)")
    conds = [_expr_sql(e, outer_bind) for e in q.filters]
    semi_groups = ([("NOT EXISTS", g) for g in q.not_exists]
                   + [("NOT EXISTS", g) for g in q.minus]
                   + [("EXISTS", g) for g in q.exists])
    for i, (sql_kw, (pats, flts)) in enumerate(semi_groups):
        g_sql, g_vars = _group_sql(pats, flts, quads_rel,
                                   q.meta_specs())
        shared = [v for v in outer_bind if v in g_vars]
        if not shared:
            continue  # MINUS sharing no variable removes nothing
        on = " AND ".join(f"nx{i}.{v} = {outer_bind[v]}" for v in shared)
        conds.append(f"{sql_kw} (SELECT 1 FROM ({g_sql}) nx{i} "
                     f"WHERE {on})")
    return from_sql, outer_bind, conds


def sparql_construct_to_sql(query: str | SparqlQuery,
                            quads_rel: str = "quads") -> str:
    """Compile a CONSTRUCT (subset) query to ANSI SQL yielding the
    DISTINCT (subj, pred, obj) triple set — the oracle backend for
    :func:`sparql_construct`. The solution relation is inlined once
    per template triple (derived tables, no CTE — callers prepend
    their own WITH clauses)."""
    q = parse_sparql(query) if isinstance(query, str) else query
    if not q.construct:
        raise ValueError("sparql_construct_to_sql needs CONSTRUCT")
    from_sql, outer_bind, conds = _solution_sql_parts(q, quads_rel)
    sol = ("SELECT " + ", ".join(f"{outer_bind[v]} AS {v}"
                                 for v in outer_bind)
           + "\nFROM " + from_sql)
    if conds:
        sol += "\nWHERE " + " AND ".join(conds)
    parts = []
    for i, tp in enumerate(q.construct):
        sel, notnull = [], []
        for name, term in (("subj", tp.s), ("pred", tp.p), ("obj", tp.o)):
            if term.kind == "var":
                sel.append(f"s{i}.{term.value} AS {name}")
                notnull.append(f"s{i}.{term.value} IS NOT NULL")
            else:
                sel.append(f"{_sql_str(term.value)} AS {name}")
        part = f"SELECT {', '.join(sel)} FROM (\n{sol}\n) s{i}"
        if notnull:
            part += " WHERE " + " AND ".join(notnull)
        parts.append(part)
    return ("SELECT DISTINCT subj, pred, obj FROM (\n"
            + "\nUNION ALL\n".join(parts) + "\n) cons")


def sparql_to_sql(query: str | SparqlQuery, quads_rel: str = "quads") -> str:
    """Compile the same SPARQL subset to ANSI SQL over a relation with
    columns subj/pred/obj — the independent oracle backend. The
    required pattern group and each OPTIONAL group become derived
    tables, LEFT JOINed on their shared variables."""
    q = parse_sparql(query) if isinstance(query, str) else query
    if q.construct:
        raise ValueError("use sparql_construct_to_sql for CONSTRUCT")
    if q.describe:
        raise ValueError("use sparql_describe_to_sql for DESCRIBE")
    from_sql, outer_bind, conds = _solution_sql_parts(q, quads_rel)

    if q.aggs:
        sel_items = [f"{outer_bind[v]} AS {v}" for v in q.group_by]
        for fn, avar, alias in q.aggs:
            aref = outer_bind[avar]
            if fn in ("SUM", "AVG"):
                # TRY_CAST mirrors the engine's _numeric_col coercion
                sel_items.append(
                    f"{fn}(TRY_CAST({aref} AS DOUBLE)) AS {alias}")
            elif fn == "GROUP_CONCAT":
                # sorted concatenation — deterministic on both backends
                sel_items.append(
                    f"string_agg({aref}, {_sql_str(q.agg_sep)} "
                    f"ORDER BY {aref}) AS {alias}")
            elif fn == "COUNT":
                # required var: COUNT(?v) == COUNT(*) on both backends
                sel_items.append(f"COUNT(*) AS {alias}")
            elif fn == "COUNT_DISTINCT":
                sel_items.append(f"COUNT(DISTINCT {aref}) AS {alias}")
            elif fn == "SAMPLE":
                # pinned to MIN on both backends (deterministic pick)
                sel_items.append(f"MIN({aref}) AS {alias}")
            else:
                sel_items.append(f"{fn}({aref}) AS {alias}")
        sql = "SELECT " + ", ".join(sel_items) + "\nFROM " + from_sql
        if conds:
            sql += "\nWHERE " + " AND ".join(conds)
        if q.group_by:
            sql += "\nGROUP BY " + ", ".join(
                outer_bind[v] for v in q.group_by)
        if q.having:
            # aliases are referencable in DuckDB HAVING; group vars
            # resolve to their scan bindings
            hb = {**{v: outer_bind[v] for v in q.group_by},
                  **{a: a for _, _, a in q.aggs}}
            sql += "\nHAVING " + " AND ".join(
                _expr_sql(e, hb) for e in q.having)
    else:
        out_vars = q.select_vars or [v for v in outer_bind
                                     if not v.startswith(_INTERNAL)]
        sel = ", ".join(f"{outer_bind[v]} AS {v}" for v in out_vars)
        sql = ("SELECT " + ("DISTINCT " if q.distinct else "") + sel
               + "\nFROM " + from_sql)
        if conds:
            sql += "\nWHERE " + " AND ".join(conds)
    if q.order_by:
        sql += "\nORDER BY " + ", ".join(
            f"{v} {'ASC' if asc else 'DESC'}" for v, asc in q.order_by)
    if q.limit is not None:
        sql += f"\nLIMIT {q.limit} OFFSET {q.offset}"
    return sql
