"""SPARQL subset: Ray Data backend vs the SQL compiler backend.

Every query runs through BOTH independent backends
(sparql.sparql_select on a Ray Dataset, sparql.sparql_to_sql on
DuckDB) and must agree by row count + columns + value hash — the same
comparison the driver gate applies to q_sparql_docs.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pytest


def _hash_df(df):
    d = df[sorted(df.columns)].astype(str)
    d = d.sort_values(list(d.columns)).reset_index(drop=True)
    return hashlib.md5(d.to_csv(index=False).encode()).hexdigest()


QUADS = pa.table({
    "subj": ["e:a", "e:a", "e:b", "e:b", "e:c", "e:a", "e:c", "e:d",
             "e:d"],
    "pred": ["p:loc", "p:knows", "p:loc", "p:knows", "p:loc", "p:knows",
             "p:emp", "p:knows", "p:emp"],
    "obj": ["l:bay", "e:b", "l:shelf", "e:c", "l:bay", "e:c", "42",
            "e:d", "7"],
    "graph": ["g1"] * 4 + ["g2"] * 5,
    # language tags for the literal objects (LANG() test surface)
    "obj_lang": ["en", "", "fr", "", "en", "", "", "", ""],
    # term metadata (isLiteral/isIRI/DATATYPE test surface): the
    # p:loc/p:emp objects are literals, p:knows objects are IRIs
    "obj_is_literal": [True, False, True, False, True, False, True,
                       False, True],
    "obj_datatype": ["", "", "", "", "",
                     "", "http://www.w3.org/2001/XMLSchema#integer",
                     "", "http://www.w3.org/2001/XMLSchema#integer"],
})

CROSS_QUERIES = [
    # join on one shared var + constant object
    'PREFIX p: <p:> SELECT ?x ?y WHERE '
    '{ ?x p:knows ?y . ?x p:loc "l:bay" . }',
    # DISTINCT projection
    'PREFIX p: <p:> SELECT DISTINCT ?x ?l WHERE { ?x p:loc ?l . }',
    # 2-hop join + OR filter with CONTAINS
    'PREFIX p: <p:> SELECT ?x ?y ?l WHERE { ?x p:knows ?y . ?y p:loc ?l .'
    ' FILTER (CONTAINS(?l, "bay") || ?l = "l:shelf") }',
    # ORDER BY DESC + LIMIT/OFFSET pagination (typed-table return path)
    'PREFIX p: <p:> SELECT DISTINCT ?x ?l WHERE { ?x p:loc ?l . }'
    ' ORDER BY DESC(?l) ?x LIMIT 2 OFFSET 1',
    # STRSTARTS + && + != between var and literal
    'PREFIX p: <p:> SELECT ?a ?b WHERE { ?a p:knows ?b .'
    ' FILTER (STRSTARTS(?b, "e:c") && ?a != "e:b") }',
    # same var in subject and object (self-loop; e:d knows e:d)
    'PREFIX p: <p:> SELECT ?x WHERE { ?x p:knows ?x . }',
    # multi-var shared join (composite key): both vars shared
    'PREFIX p: <p:> SELECT DISTINCT ?x ?y WHERE '
    '{ ?x p:knows ?y . ?x p:knows ?y . }',
    # OPTIONAL left join: e:d knows e:d but has no p:loc → null loc
    'PREFIX p: <p:> SELECT ?x ?y ?l WHERE { ?x p:knows ?y .'
    ' OPTIONAL { ?y p:loc ?l . } }',
    # OPTIONAL with a filter inside the optional group
    'PREFIX p: <p:> SELECT ?x ?l WHERE { ?x p:knows ?y .'
    ' OPTIONAL { ?x p:loc ?l . FILTER (CONTAINS(?l, "bay")) } }',
    # top-level filter on an optional var drops unmatched rows
    'PREFIX p: <p:> SELECT ?x ?l WHERE { ?x p:knows ?y .'
    ' OPTIONAL { ?y p:loc ?l . } FILTER (?l != "l:bay") }',
    # grouped COUNT
    'PREFIX p: <p:> SELECT ?x (COUNT(?y) AS ?n) WHERE '
    '{ ?x p:knows ?y . } GROUP BY ?x',
    # global COUNT
    'PREFIX p: <p:> SELECT (COUNT(?y) AS ?n) WHERE { ?x p:knows ?y . }',
    # grouped COUNT over a join, ordered with LIMIT
    'PREFIX p: <p:> SELECT ?l (COUNT(?x) AS ?n) WHERE '
    '{ ?x p:loc ?l . ?x p:knows ?y . } GROUP BY ?l'
    ' ORDER BY DESC(?n) ?l LIMIT 2',
    # UNION of two branches binding the same vars (bag union)
    'PREFIX p: <p:> SELECT ?x ?v WHERE '
    '{ { ?x p:loc ?v . } UNION { ?x p:knows ?v . } }',
    # UNION + DISTINCT + a filter inside one branch
    'PREFIX p: <p:> SELECT DISTINCT ?x ?v WHERE '
    '{ { ?x p:loc ?v . FILTER (CONTAINS(?v, "bay")) } UNION '
    '{ ?x p:knows ?v . } }',
    # UNION feeding a grouped COUNT
    'PREFIX p: <p:> SELECT ?x (COUNT(?v) AS ?n) WHERE '
    '{ { ?x p:loc ?v . } UNION { ?x p:knows ?v . } } GROUP BY ?x',
    # FILTER NOT EXISTS: knowers with no location
    'PREFIX p: <p:> SELECT ?x ?y WHERE { ?x p:knows ?y .'
    ' FILTER NOT EXISTS { ?x p:loc ?l . } }',
    # NOT EXISTS with a filter inside the group (anti-join on a subset)
    'PREFIX p: <p:> SELECT ?x ?y WHERE { ?x p:knows ?y .'
    ' FILTER NOT EXISTS { ?x p:loc ?l . FILTER (CONTAINS(?l, "bay")) } }',
    # NOT EXISTS correlated on TWO shared vars (composite anti-join):
    # knows-pairs that are not mutual
    'PREFIX p: <p:> SELECT ?x ?y WHERE { ?x p:knows ?y .'
    ' FILTER NOT EXISTS { ?y p:knows ?x . } }',
    # MINUS: same anti-join shape as NOT EXISTS when vars are shared
    'PREFIX p: <p:> SELECT ?x ?y WHERE { ?x p:knows ?y .'
    ' MINUS { ?x p:loc ?l . } }',
    # MINUS sharing NO variable removes nothing (spec compatibility
    # rule) — both backends must keep every row
    'PREFIX p: <p:> SELECT ?x ?y WHERE { ?x p:knows ?y .'
    ' MINUS { ?a p:emp ?v . } }',
    # MINUS with a filter inside the group
    'PREFIX p: <p:> SELECT ?x ?y WHERE { ?x p:knows ?y .'
    ' MINUS { ?y p:loc ?l . FILTER (CONTAINS(?l, "shelf")) } }',
    # FILTER EXISTS: the semi-join twin
    'PREFIX p: <p:> SELECT ?x ?y WHERE { ?x p:knows ?y .'
    ' FILTER EXISTS { ?x p:loc ?l . } }',
    # EXISTS on two shared vars: mutual knows-pairs only
    'PREFIX p: <p:> SELECT ?x ?y WHERE { ?x p:knows ?y .'
    ' FILTER EXISTS { ?y p:knows ?x . } }',
    # EXISTS whose group matches nothing: empty result on both sides
    'PREFIX p: <p:> SELECT ?x ?y WHERE { ?x p:knows ?y .'
    ' FILTER EXISTS { ?x p:loc "l:nowhere" . } }',
    # EXISTS + NOT EXISTS combined on one plan
    'PREFIX p: <p:> SELECT ?x ?y WHERE { ?x p:knows ?y .'
    ' FILTER EXISTS { ?x p:loc ?l . }'
    ' FILTER NOT EXISTS { ?x p:emp ?v . } }',
    # multi-variable VALUES: composite-tuple membership
    'PREFIX p: <p:> SELECT ?x ?y WHERE { ?x p:knows ?y .'
    ' VALUES (?x ?y) { ("e:a" "e:b") ("e:d" "e:d") ("e:a" "e:zzz") } }',
    # multi-var VALUES over required + OPTIONAL var (null never matches)
    'PREFIX p: <p:> SELECT ?x ?l WHERE { ?x p:knows ?y .'
    ' OPTIONAL { ?x p:loc ?l . }'
    ' VALUES (?x ?l) { ("e:a" "l:bay") ("e:d" "l:bay") } }',
    # REGEX filter (RE2 dialect on both backends)
    'PREFIX p: <p:> SELECT ?x ?l WHERE { ?x p:loc ?l .'
    ' FILTER (REGEX(?l, "^l:(bay|shelf)$")) }',
    # VALUES inline data (membership restriction on a bound var)
    'PREFIX p: <p:> SELECT ?x ?y WHERE { ?x p:knows ?y .'
    ' VALUES ?x { "e:a" "e:d" } }',
    # VALUES combined with a comparison filter
    'PREFIX p: <p:> SELECT ?x ?l WHERE { ?x p:loc ?l .'
    ' VALUES ?l { "l:bay" "l:shelf" "l:nowhere" } FILTER (?x != "e:c") }',
    # grouped MIN aggregate (string collation)
    'PREFIX p: <p:> SELECT ?x (MIN(?y) AS ?first) WHERE '
    '{ ?x p:knows ?y . } GROUP BY ?x',
    # SAMPLE (pinned to MIN on both backends) mixed with COUNT
    'PREFIX p: <p:> SELECT ?x (SAMPLE(?y) AS ?any) (COUNT(?y) AS ?n) '
    'WHERE { ?x p:knows ?y . } GROUP BY ?x',
    # STRENDS filter
    'PREFIX p: <p:> SELECT ?a ?b WHERE { ?a p:knows ?b .'
    ' FILTER (STRENDS(?b, ":c")) }',
    # global MAX aggregate
    'PREFIX p: <p:> SELECT (MAX(?l) AS ?top) WHERE { ?x p:loc ?l . }',
    # grouped MAX over a UNION solution
    'PREFIX p: <p:> SELECT ?x (MAX(?v) AS ?mx) WHERE '
    '{ { ?x p:loc ?v . } UNION { ?x p:knows ?v . } } GROUP BY ?x',
    # property path +: transitive closure over a CYCLIC knows graph
    # (e:a->e:c->e:a); semi-naive rounds vs recursive CTE
    'PREFIX p: <p:> SELECT DISTINCT ?x ?y WHERE { ?x p:knows+ ?y . }',
    # path + with both endpoints the same var: nodes on a knows-cycle
    'PREFIX p: <p:> SELECT DISTINCT ?x WHERE { ?x p:knows+ ?x . }',
    # sequence path: closure feeding a second hop (fresh __pp var)
    'PREFIX p: <p:> SELECT DISTINCT ?x ?l WHERE '
    '{ ?x p:knows+/p:loc ?l . }',
    # inverse path: ^loc turns location into subject position
    'PREFIX p: <p:> SELECT DISTINCT ?l ?x WHERE { ?l ^p:loc ?x . }',
    # inverse + sequence: co-located pairs via ^loc/loc
    'PREFIX p: <p:> SELECT DISTINCT ?a ?b WHERE '
    '{ ?a p:loc/^p:loc ?b . FILTER (?a != ?b) }',
    # path + under a grouped COUNT (closure as aggregate input)
    'PREFIX p: <p:> SELECT ?y (COUNT(?x) AS ?n) WHERE '
    '{ ?x p:knows+ ?y . } GROUP BY ?y',
    # bound-object inverse path step
    'PREFIX p: <p:> SELECT DISTINCT ?x WHERE { "l:bay" ^p:loc ?x . }',
    # alternative predicate set (bag of both edge scans)
    'PREFIX p: <p:> SELECT DISTINCT ?x ?y WHERE '
    '{ ?x (p:knows|p:loc) ?y . }',
    # closure over the UNION edge set of an alternative step
    'PREFIX p: <p:> SELECT DISTINCT ?x ?y WHERE '
    '{ ?x (p:knows|p:loc)+ ?y . }',
    # alternative step inside a sequence path
    'PREFIX p: <p:> SELECT DISTINCT ?x ?l WHERE '
    '{ ?x (p:knows|p:emp)/p:loc ?l . }',
    # property path + inside an OPTIONAL group (left-join a closure)
    'PREFIX p: <p:> SELECT DISTINCT ?x ?y WHERE { ?x p:loc ?l .'
    ' OPTIONAL { ?x p:knows+ ?y . } }',
    # path + inside FILTER NOT EXISTS (anti-join against a closure)
    'PREFIX p: <p:> SELECT DISTINCT ?x WHERE { ?x p:loc ?l .'
    ' FILTER NOT EXISTS { ?x p:knows+ ?x . } }',
    # BIND with CONCAT of vars and a literal
    'PREFIX p: <p:> SELECT ?x ?tag WHERE { ?x p:loc ?l .'
    ' BIND(CONCAT(?x, "@", ?l) AS ?tag) }',
    # BIND var copy + filter on the bound variable
    'PREFIX p: <p:> SELECT ?x ?x2 WHERE { ?x p:loc ?l .'
    ' BIND(?x AS ?x2) FILTER (CONTAINS(?x2, "e:a")) }',
    # constant BIND feeding a grouped COUNT over the bound var
    'PREFIX p: <p:> SELECT ?c (COUNT(?x) AS ?n) WHERE '
    '{ ?x p:loc ?l . BIND("all" AS ?c) } GROUP BY ?c',
    # BIND used before an OPTIONAL join (bound var + null-filled var)
    'PREFIX p: <p:> SELECT ?tag ?y WHERE { ?x p:loc ?l .'
    ' BIND(CONCAT(?l, "!") AS ?tag) OPTIONAL { ?x p:knows ?y . } }',
    # GRAPH with a constant IRI: only that graph's rows match
    'PREFIX p: <p:> SELECT ?x ?y WHERE '
    '{ GRAPH <g1> { ?x p:knows ?y . } }',
    # GRAPH variable: binds the graph column, selectable
    'PREFIX p: <p:> SELECT ?g ?x ?l WHERE '
    '{ GRAPH ?g { ?x p:loc ?l . } }',
    # shared graph var across two patterns = same-graph join
    'PREFIX p: <p:> SELECT DISTINCT ?g ?x WHERE '
    '{ GRAPH ?g { ?x p:knows ?y . ?x p:loc ?l . } }',
    # graph-scoped transitive closure (g2's knows edges only)
    'PREFIX p: <p:> SELECT DISTINCT ?x ?y WHERE '
    '{ GRAPH <g2> { ?x p:knows+ ?y . } }',
    # GRAPH block with an inner filter + pattern outside the block
    'PREFIX p: <p:> SELECT ?x ?l WHERE { ?x p:knows ?y .'
    ' GRAPH <g1> { ?x p:loc ?l . FILTER (CONTAINS(?l, "bay")) } }',
    # --- typed-literal / numeric comparisons (engine: _numeric_col;
    # SQL: TRY_CAST) ---
    # numeric range filter over string-stored integers
    'PREFIX p: <p:> SELECT ?x ?e WHERE { ?x p:emp ?e .'
    ' FILTER (?e > 10 && ?e <= 42) }',
    # numeric equality + typed xsd:integer literal form
    'PREFIX p: <p:> PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>'
    ' SELECT ?x WHERE { ?x p:emp ?e . FILTER (?e = "7"^^xsd:integer) }',
    # non-numeric values null out of a numeric comparison (location
    # strings never match): both backends drop every row
    'PREFIX p: <p:> SELECT ?x WHERE { ?x p:loc ?l . FILTER (?l < 99) }',
    # typed non-numeric literal (dateTime-style) compares as string
    'PREFIX p: <p:> PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>'
    ' SELECT ?x ?l WHERE { ?x p:loc ?l .'
    ' FILTER (?l >= "l:bay"^^xsd:string) }',
    # --- LANG / STRLEN / BOUND / ! ---
    # LANG() equality over the literal objects
    'PREFIX p: <p:> SELECT ?x ?l WHERE { ?x p:loc ?l .'
    ' FILTER (LANG(?l) = "en") }',
    # LANG() != inside an OR with a plain comparison
    'PREFIX p: <p:> SELECT ?x ?l WHERE { ?x p:loc ?l .'
    ' FILTER (LANG(?l) != "en" || ?l = "l:bay") }',
    # STRLEN threshold (characters on both backends)
    'PREFIX p: <p:> SELECT ?x ?l WHERE { ?x p:loc ?l .'
    ' FILTER (STRLEN(?l) > 5) }',
    # BOUND over an optional var keeps only matched rows
    'PREFIX p: <p:> SELECT ?x ?l WHERE { ?x p:knows ?y .'
    ' OPTIONAL { ?x p:loc ?l . } FILTER (BOUND(?l)) }',
    # !BOUND keeps only the unmatched rows
    'PREFIX p: <p:> SELECT ?x WHERE { ?x p:knows ?y .'
    ' OPTIONAL { ?x p:emp ?e . } FILTER (!BOUND(?e)) }',
    # --- BIND(IF(...)) after OPTIONAL ---
    'PREFIX p: <p:> SELECT ?x ?has WHERE { ?x p:knows ?y .'
    ' OPTIONAL { ?x p:emp ?e . }'
    ' BIND(IF(!BOUND(?e), "no-emp", ?e) AS ?has) }',
    # IF with a numeric condition on an optional var (null → else)
    'PREFIX p: <p:> SELECT ?x ?big WHERE { ?x p:knows ?y .'
    ' OPTIONAL { ?x p:emp ?e . }'
    ' BIND(IF(?e > 10, "big", "small") AS ?big) }',
    # --- multiple aggregates in one grouped pass ---
    'PREFIX p: <p:> SELECT ?x (COUNT(?y) AS ?n) (MIN(?y) AS ?lo) '
    '(MAX(?y) AS ?hi) WHERE { ?x p:knows ?y . } GROUP BY ?x',
    # mixed numeric + string aggregates over a join
    'PREFIX p: <p:> SELECT ?l (SUM(?e) AS ?total) (AVG(?e) AS ?m) '
    '(COUNT(?x) AS ?n) WHERE { ?x p:loc ?l . ?x p:emp ?e . } '
    'GROUP BY ?l',
    # global multi-aggregate (single-row result)
    'PREFIX p: <p:> SELECT (COUNT(?e) AS ?n) (SUM(?e) AS ?total) '
    '(MAX(?e) AS ?hi) WHERE { ?x p:emp ?e . }',
    # multi-aggregate ordered by one alias with LIMIT (typed edge)
    'PREFIX p: <p:> SELECT ?x (COUNT(?y) AS ?n) (MAX(?y) AS ?hi) '
    'WHERE { ?x p:knows ?y . } GROUP BY ?x ORDER BY DESC(?n) ?x '
    'LIMIT 2',
    # --- HAVING over aggregate aliases ---
    'PREFIX p: <p:> SELECT ?x (COUNT(?y) AS ?n) WHERE '
    '{ ?x p:knows ?y . } GROUP BY ?x HAVING (?n >= 2)',
    # HAVING over a SUM alias with && of two aliases
    'PREFIX p: <p:> SELECT ?x (SUM(?e) AS ?total) (COUNT(?e) AS ?n) '
    'WHERE { ?x p:emp ?e . } GROUP BY ?x '
    'HAVING (?total > 5 && ?n >= 1)',
    # HAVING that filters everything out (empty result both sides)
    'PREFIX p: <p:> SELECT ?x (COUNT(?y) AS ?n) WHERE '
    '{ ?x p:knows ?y . } GROUP BY ?x HAVING (?n > 99)',
    # --- SUM / AVG / GROUP_CONCAT aggregates ---
    # grouped SUM of numeric strings
    'PREFIX p: <p:> SELECT ?x (SUM(?e) AS ?total) WHERE '
    '{ ?x p:emp ?e . } GROUP BY ?x',
    # global SUM
    'PREFIX p: <p:> SELECT (SUM(?e) AS ?total) WHERE { ?x p:emp ?e . }',
    # grouped AVG over a join
    'PREFIX p: <p:> SELECT ?l (AVG(?e) AS ?m) WHERE '
    '{ ?x p:emp ?e . ?x p:loc ?l . } GROUP BY ?l',
    # grouped GROUP_CONCAT (sorted, custom separator)
    'PREFIX p: <p:> SELECT ?x (GROUP_CONCAT(?y; SEPARATOR=",") AS ?ys)'
    ' WHERE { ?x p:knows ?y . } GROUP BY ?x',
    # global GROUP_CONCAT with the default separator
    'PREFIX p: <p:> SELECT (GROUP_CONCAT(?l) AS ?locs) WHERE '
    '{ ?x p:loc ?l . }',
    # --- property-path * and ? ---
    # zero-or-more: identity over the node set ∪ transitive closure
    'PREFIX p: <p:> SELECT DISTINCT ?x ?y WHERE { ?x p:knows* ?y . }',
    # zero-or-one: identity ∪ single hop
    'PREFIX p: <p:> SELECT DISTINCT ?x ?y WHERE { ?x p:knows? ?y . }',
    # * with a constant endpoint (includes the zero-hop pair)
    'PREFIX p: <p:> SELECT DISTINCT ?y WHERE { "e:b" p:knows* ?y . }',
    # * over an absent predicate degrades to pure identity
    'PREFIX p: <p:> SELECT DISTINCT ?x ?y WHERE { ?x p:nope* ?y . }',
    # ? inside a sequence path joined with a plain pattern
    'PREFIX p: <p:> SELECT DISTINCT ?x ?l WHERE '
    '{ ?x p:knows?/p:loc ?l . }',
    # graph-scoped * (g2's knows edges and node set only)
    'PREFIX p: <p:> SELECT DISTINCT ?x ?y WHERE '
    '{ GRAPH <g2> { ?x p:knows* ?y . } }',
    # * closure feeding a grouped COUNT
    'PREFIX p: <p:> SELECT ?y (COUNT(?x) AS ?n) WHERE '
    '{ ?x p:knows* ?y . } GROUP BY ?y',
    # COUNT(DISTINCT ?s) — the reference's idiom verbatim
    # (docs/components/sembench.md:242), global over a full wildcard
    'SELECT (COUNT(DISTINCT ?s) as ?count) WHERE { ?s ?p ?o . }',
    # grouped distinct count (e:a knows two people under p:knows)
    'SELECT ?p (COUNT(DISTINCT ?s) AS ?n) WHERE { ?s ?p ?o . } '
    'GROUP BY ?p',
    # distinct count + HAVING over the alias + ORDER BY
    'SELECT ?p (COUNT(DISTINCT ?s) AS ?n) WHERE { ?s ?p ?o . } '
    'GROUP BY ?p HAVING (?n >= 2) ORDER BY ?n ?p',
    # distinct count over a join (duplication from the closure)
    'PREFIX p: <p:> SELECT (COUNT(DISTINCT ?y) AS ?n) WHERE '
    '{ ?x p:knows+ ?y . }',
    # --- string-function BINDs (round 4) ---
    'PREFIX p: <p:> SELECT ?x ?u ?d WHERE { ?x p:loc ?l . '
    'BIND(UCASE(?l) AS ?u) BIND(LCASE(?u) AS ?d) }',
    # SUBSTR 2-arg (to end) and 3-arg (start, len), 1-based
    'PREFIX p: <p:> SELECT ?x ?a ?b WHERE { ?x p:loc ?l . '
    'BIND(SUBSTR(?l, 3) AS ?a) BIND(SUBSTR(?l, 2, 3) AS ?b) }',
    # SUBSTR len overrunning the string end (both engines clamp)
    'PREFIX p: <p:> SELECT ?x ?t WHERE { ?x p:loc ?l . '
    'BIND(SUBSTR(?l, 4, 99) AS ?t) }',
    # REPLACE with a regex class and global replacement
    'PREFIX p: <p:> SELECT ?x ?r WHERE { ?x p:loc ?l . '
    'BIND(REPLACE(?l, "[aeiou]", "_") AS ?r) }',
    # STRBEFORE/STRAFTER: delimiter present (l:bay) and the
    # empty-result-when-absent rule exercised via a miss delimiter
    'PREFIX p: <p:> SELECT ?x ?ns ?loc ?m WHERE { ?x p:loc ?l . '
    'BIND(STRBEFORE(?l, ":") AS ?ns) BIND(STRAFTER(?l, ":") AS ?loc) '
    'BIND(STRAFTER(?l, "zz") AS ?m) }',
    # a strfn bind target is referencable by a later CONCAT bind and
    # usable in FILTER / ORDER BY
    'PREFIX p: <p:> SELECT ?x ?w WHERE { ?x p:loc ?l . '
    'BIND(UCASE(?l) AS ?u) BIND(CONCAT(?u, "!") AS ?w) '
    'FILTER (STRSTARTS(?w, "L:B")) } ORDER BY ?x ?w',
    # COALESCE picks the first bound optional var, else the fallback
    'PREFIX p: <p:> SELECT ?x ?v WHERE { ?x p:knows ?y . '
    'OPTIONAL { ?x p:loc ?l . } OPTIONAL { ?x p:emp ?e . } '
    'BIND(COALESCE(?l, ?e, "none") AS ?v) }',
    # COALESCE over one optional + required fallback, grouped count
    'PREFIX p: <p:> SELECT ?v (COUNT(?x) AS ?n) WHERE '
    '{ ?x p:knows ?y . OPTIONAL { ?x p:emp ?e . } '
    'BIND(COALESCE(?e, "0") AS ?v) } GROUP BY ?v',
    # --- term inspection + IN filters (round 4) ---
    'SELECT ?s ?o WHERE { ?s ?p ?o . FILTER (isLiteral(?o)) }',
    'SELECT ?s ?o WHERE { ?s ?p ?o . FILTER (isIRI(?o)) }',
    # DATATYPE equality against a prefixed IRI, with a second filter
    'PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> '
    'PREFIX p: <p:> SELECT ?s ?o WHERE { ?s p:emp ?o . '
    'FILTER (DATATYPE(?o) = xsd:integer && ?o > 5) }',
    # != direction; isURI alias inside a disjunction
    'PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> '
    'SELECT ?s ?o WHERE { ?s ?p ?o . '
    'FILTER (DATATYPE(?o) != xsd:integer || isURI(?o)) }',
    # IN / NOT IN membership; NOT IN over a nullable optional var
    'PREFIX p: <p:> SELECT ?x ?l WHERE { ?x p:loc ?l . '
    'FILTER (?l IN ("l:bay", "l:nope")) }',
    'PREFIX p: <p:> SELECT ?x ?l WHERE { ?x p:knows ?y . '
    'OPTIONAL { ?x p:loc ?l . } FILTER (?l NOT IN ("l:bay")) }',
    # --- aggregate subqueries (round 4) ---
    # basic: inner-join the per-subject knows-count to the loc scan
    'PREFIX p: <p:> SELECT ?x ?l ?n WHERE { ?x p:loc ?l . '
    '{ SELECT ?x (COUNT(?y) AS ?n) WHERE { ?x p:knows ?y } '
    'GROUP BY ?x } }',
    # filter over the alias
    'PREFIX p: <p:> SELECT ?x ?n WHERE { ?x p:loc "l:bay" . '
    '{ SELECT ?x (COUNT(?y) AS ?n) WHERE { ?x p:knows ?y } '
    'GROUP BY ?x } FILTER (?n >= 2) }',
    # subquery-only body + outer global aggregate over the alias
    'PREFIX p: <p:> SELECT (MAX(?n) AS ?m) WHERE { '
    '{ SELECT ?x (COUNT(?y) AS ?n) WHERE { ?x p:knows ?y } '
    'GROUP BY ?x } }',
    # outer grouped SUM over the alias, joined through a pattern
    'PREFIX p: <p:> SELECT ?l (SUM(?n) AS ?t) WHERE { ?x p:loc ?l . '
    '{ SELECT ?x (COUNT(?y) AS ?n) WHERE { ?x p:knows ?y } '
    'GROUP BY ?x } } GROUP BY ?l',
    # ORDER BY the alias + LIMIT (typed-table return path keeps int64)
    'PREFIX p: <p:> SELECT ?x ?n WHERE { ?x p:knows ?z . '
    '{ SELECT ?x (COUNT(?y) AS ?n) WHERE { ?x p:knows ?y } '
    'GROUP BY ?x } } ORDER BY DESC(?n) ?x LIMIT 3',
    # subquery + OPTIONAL: alias joins before the left join
    'PREFIX p: <p:> SELECT ?x ?n ?e WHERE { ?x p:knows ?z . '
    '{ SELECT ?x (COUNT(?y) AS ?n) WHERE { ?x p:knows ?y } '
    'GROUP BY ?x } OPTIONAL { ?x p:emp ?e . } }',
    # subquery with its own filter; MIN aggregate (string-typed alias)
    'PREFIX p: <p:> SELECT ?x ?first WHERE { ?x p:loc "l:bay" . '
    '{ SELECT ?x (MIN(?y) AS ?first) WHERE { ?x p:knows ?y . '
    'FILTER (?y != "e:d") } GROUP BY ?x } }',
    # two subqueries joined on the same outer variable
    'PREFIX p: <p:> SELECT ?x ?n ?first WHERE { ?x p:loc ?l . '
    '{ SELECT ?x (COUNT(?y) AS ?n) WHERE { ?x p:knows ?y } '
    'GROUP BY ?x } '
    '{ SELECT ?x (MIN(?y) AS ?first) WHERE { ?x p:knows ?y } '
    'GROUP BY ?x } }',
    # --- numeric BINDs (integer-exact arithmetic) ---
    # var op literal; the bound var filters numerically downstream
    'PREFIX p: <p:> SELECT ?x ?d WHERE { ?x p:emp ?e . '
    'BIND(?e * 2 AS ?d) FILTER (?d > 20) }',
    # var op var (same var twice) + subtraction with a negative result
    'PREFIX p: <p:> SELECT ?x ?z ?m WHERE { ?x p:emp ?e . '
    'BIND(?e - ?e AS ?z) BIND(?z - 5 AS ?m) }',
    # addition chained through an earlier bind target
    'PREFIX p: <p:> SELECT ?x ?b WHERE { ?x p:emp ?e . '
    'BIND(?e + 1 AS ?a) BIND(?a + ?e AS ?b) }',
    # non-integer lexical (p:loc strings) nulls the result, and the
    # null survives to the output identically on both backends
    'PREFIX p: <p:> SELECT ?x ?n WHERE { ?x p:loc ?l . '
    'BIND(?l + 1 AS ?n) }',
    # ABS / CEIL / FLOOR / ROUND over integer-stored values
    'PREFIX p: <p:> SELECT ?x ?a ?c ?f ?r WHERE { ?x p:emp ?e . '
    'BIND(?e - 50 AS ?neg) BIND(ABS(?neg) AS ?a) '
    'BIND(CEIL(?e) AS ?c) BIND(FLOOR(?e) AS ?f) '
    'BIND(ROUND(?e) AS ?r) }',
    # arithmetic result as a GROUP BY key
    'PREFIX p: <p:> SELECT ?d (COUNT(?x) AS ?n) WHERE '
    '{ ?x p:emp ?e . BIND(?e * 0 AS ?d) } GROUP BY ?d',
    # --- negated property sets ---
    # single negated predicate
    'PREFIX p: <p:> SELECT ?x ?o WHERE { ?x !p:knows ?o . }',
    # negated set
    'PREFIX p: <p:> SELECT ?x ?y WHERE { ?x !(p:loc|p:emp) ?y . }',
    # inverse of a negated set
    'PREFIX p: <p:> SELECT ?x ?y WHERE { ?x ^!(p:knows) ?y . }',
    # negated step inside a sequence path
    'PREFIX p: <p:> SELECT ?x ?l WHERE { ?x !p:emp/p:loc ?l . }',
    # --- arithmetic inside FILTER comparisons ---
    # var * literal on the left
    'PREFIX p: <p:> SELECT ?x ?e WHERE { ?x p:emp ?e . '
    'FILTER (?e * 2 > 50) }',
    # arith on the right, literal on the left
    'PREFIX p: <p:> SELECT ?x WHERE { ?x p:emp ?e . '
    'FILTER (10 < ?e - 5) }',
    # var-vs-var with an offset (joined through p:knows)
    'PREFIX p: <p:> SELECT ?x ?y WHERE { ?x p:knows ?y . '
    '?x p:emp ?e . ?y p:emp ?f . FILTER (?e > ?f - 1) }',
    # arithmetic over a non-numeric lexical nulls and drops the row
    'PREFIX p: <p:> SELECT ?x WHERE { ?x p:loc ?l . '
    'FILTER (?l + 1 > 0) }',
]


@pytest.mark.parametrize("query", CROSS_QUERIES)
def test_backends_agree(ray_session, query):
    import duckdb
    import ray.data as rd

    from k_gap_ray.sparql import sparql_select, sparql_to_sql

    res = sparql_select(rd.from_arrow(QUADS).repartition(3), query)
    eng = res.to_pandas()
    con = duckdb.connect()
    con.register("quads", QUADS)
    ora = con.execute(sparql_to_sql(query)).df()
    assert len(eng) == len(ora)
    if len(ora):  # empty Ray results lose their schema in to_pandas
        assert sorted(eng.columns) == sorted(ora.columns)
        assert _hash_df(eng) == _hash_df(ora)


def test_strfn_bind_validation():
    """Out-of-subset string-function BIND forms raise at parse time
    (the argument constraints that keep the two backends exact)."""
    from k_gap_ray.sparql import parse_sparql

    base = "PREFIX p: <p:> SELECT ?x ?v WHERE {{ ?x p:loc ?l . {} }}"
    bad = [
        # SUBSTR start must be >= 1 and integer literals only
        "BIND(SUBSTR(?l, 0) AS ?v)",
        "BIND(SUBSTR(?l, ?l) AS ?v)",
        'BIND(SUBSTR(?l, "2") AS ?v)',
        # REPLACE pattern/replacement must be string literals
        "BIND(REPLACE(?l, ?l, \"x\") AS ?v)",
        # STRBEFORE/STRAFTER need a non-empty literal delimiter
        'BIND(STRBEFORE(?l, "") AS ?v)',
        "BIND(STRAFTER(?l, ?l) AS ?v)",
        # arity errors
        "BIND(UCASE(?l, ?l) AS ?v)",
        "BIND(SUBSTR(?l) AS ?v)",
        # strfn over an OPTIONAL var is out of subset (nullable)
        None,
        # COALESCE arg must be a known var or literal
        "BIND(COALESCE(?nope, ?l) AS ?v)",
    ]
    for b in bad:
        q = (base.format(b) if b is not None else
             "PREFIX p: <p:> SELECT ?x ?v WHERE { ?x p:knows ?y . "
             "OPTIONAL { ?x p:loc ?l . } BIND(UCASE(?l) AS ?v) }")
        with pytest.raises(ValueError):
            parse_sparql(q)
    # the happy forms parse
    parse_sparql(base.format("BIND(SUBSTR(?l, 1, 0) AS ?v)"))
    parse_sparql(base.format('BIND(STRAFTER("a:b", ":") AS ?v)'))


def test_subquery_validation():
    """Out-of-subset subquery forms raise at parse time."""
    from k_gap_ray.sparql import parse_sparql

    bad = [
        # a subquery must be a grouped aggregate
        'PREFIX p: <p:> SELECT ?x ?y WHERE { ?x p:loc ?l . '
        '{ SELECT ?x ?y WHERE { ?x p:knows ?y } } }',
        # ... with a GROUP BY (global aggregates have no join key)
        'PREFIX p: <p:> SELECT ?x ?n WHERE { ?x p:loc ?l . '
        '{ SELECT (COUNT(?y) AS ?n) WHERE { ?x p:knows ?y } } }',
        # no ORDER/LIMIT inside a subquery
        'PREFIX p: <p:> SELECT ?x ?n WHERE { ?x p:loc ?l . '
        '{ SELECT ?x (COUNT(?y) AS ?n) WHERE { ?x p:knows ?y } '
        'GROUP BY ?x ORDER BY ?x LIMIT 2 } }',
        # no nesting
        'PREFIX p: <p:> SELECT ?x ?n WHERE { ?x p:loc ?l . '
        '{ SELECT ?x (MAX(?m) AS ?n) WHERE { '
        '{ SELECT ?x (COUNT(?y) AS ?m) WHERE { ?x p:knows ?y } '
        'GROUP BY ?x } } GROUP BY ?x } }',
        # alias must not rebind an outer variable
        'PREFIX p: <p:> SELECT ?x ?l WHERE { ?x p:loc ?l . '
        '{ SELECT ?x (COUNT(?y) AS ?l) WHERE { ?x p:knows ?y } '
        'GROUP BY ?x } }',
        # a braced element that is not a subquery
        'PREFIX p: <p:> SELECT ?x WHERE { ?x p:loc ?l . '
        '{ ?x p:knows ?y } }',
    ]
    for q in bad:
        with pytest.raises(ValueError):
            parse_sparql(q)
    # the happy form parses
    parse_sparql(
        'PREFIX p: <p:> SELECT ?x ?n WHERE { ?x p:loc ?l . '
        '{ SELECT ?x (COUNT(?y) AS ?n) WHERE { ?x p:knows ?y } '
        'GROUP BY ?x } }')


def test_subquery_disconnected_raises(ray_session):
    """A subquery sharing no GROUP BY var with the outer group is a
    cartesian product — both backends reject it at build time."""
    import ray.data as rd

    from k_gap_ray.sparql import sparql_select, sparql_to_sql

    q = ('PREFIX p: <p:> SELECT ?x ?n WHERE { ?x p:loc ?l . '
         '{ SELECT ?z (COUNT(?y) AS ?n) WHERE { ?z p:knows ?y } '
         'GROUP BY ?z } }')
    with pytest.raises(ValueError, match="shares no GROUP BY"):
        sparql_select(rd.from_arrow(QUADS), q)
    with pytest.raises(ValueError, match="shares no GROUP BY"):
        sparql_to_sql(q)


def test_term_inspection_validation():
    """Out-of-subset term-inspection / IN forms raise at parse time."""
    from k_gap_ray.sparql import parse_sparql

    bad = [
        # DATATYPE compares =/!= against an IRI only
        'PREFIX p: <p:> SELECT ?o WHERE { ?s p:emp ?o . '
        'FILTER (DATATYPE(?o) = "x") }',
        'PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> PREFIX p: <p:>'
        ' SELECT ?o WHERE { ?s p:emp ?o . '
        'FILTER (DATATYPE(?o) < xsd:integer) }',
        # IN lists take constants only, on a variable LHS
        'PREFIX p: <p:> SELECT ?o WHERE { ?s p:emp ?o . '
        'FILTER (?o IN (?s, "x")) }',
        'PREFIX p: <p:> SELECT ?o WHERE { ?s p:emp ?o . '
        'FILTER ("x" IN ("x")) }',
        # isLiteral needs a single object-position binder
        'PREFIX p: <p:> SELECT ?o WHERE { ?s p:emp ?o . ?t p:loc ?o . '
        'FILTER (isLiteral(?o)) }',
        'PREFIX p: <p:> SELECT ?s WHERE { ?s p:emp ?o . '
        'FILTER (isLiteral(?s)) }',
    ]
    for q in bad:
        with pytest.raises(ValueError):
            parse_sparql(q)


def test_parse_rejects_out_of_subset():
    from k_gap_ray.sparql import parse_sparql

    bad = [
        "DESCRIBE",                                        # no resources
        "SELECT ?x WHERE { }",                             # no patterns
        "SELECT ?x WHERE { ?a ?p ?b . }",                  # unbound select
        "SELECT ?a WHERE { ?a ?p ?b . ?c ?q ?d . }",       # cartesian is
        # caught at execution time, parse keeps it; LIMIT needs ORDER BY:
        "SELECT ?a WHERE { ?a ?p ?b . } LIMIT 3",
        "SELECT ?a WHERE { ?a x:y ?b . }",                 # undeclared pfx
        "ASK { ?s ?p ?o } LIMIT 1",                        # ASK+modifier
    ]
    for q in (bad[0], bad[1], bad[2], bad[4], bad[5], bad[6]):
        with pytest.raises(ValueError):
            parse_sparql(q)
    # ASK itself is in-subset now (bare block, no WHERE keyword)
    assert parse_sparql("ASK { ?s ?p ?o }").ask
    # DESCRIBE is in-subset since round 4 (constant and var forms);
    # a constant DESCRIBE takes no WHERE, a var needs a required bind
    assert parse_sparql("DESCRIBE <x:y>").describe[0].value == "x:y"
    with pytest.raises(ValueError, match="no WHERE"):
        parse_sparql("DESCRIBE <x:y> WHERE { ?s ?p ?o . }")
    with pytest.raises(ValueError, match="required"):
        parse_sparql("DESCRIBE ?z WHERE { ?s ?p ?o . "
                     "OPTIONAL { ?s ?q ?z . } }")
    with pytest.raises(ValueError):  # solution modifiers rejected
        parse_sparql("DESCRIBE ?s WHERE { ?s ?p ?o . } LIMIT 3")
    # DISTINCT only inside COUNT; COUNT(DISTINCT) is a sole aggregate
    with pytest.raises(ValueError, match="only supported inside COUNT"):
        parse_sparql("SELECT (SUM(DISTINCT ?o) AS ?t) WHERE "
                     "{ ?s ?p ?o . }")
    with pytest.raises(ValueError, match="cannot combine"):
        parse_sparql("SELECT (COUNT(DISTINCT ?s) AS ?n) (MAX(?s) AS ?m)"
                     " WHERE { ?s ?p ?o . }")


def test_cartesian_product_rejected(ray_session):
    import ray.data as rd

    from k_gap_ray.sparql import sparql_select

    with pytest.raises(ValueError, match="cartesian"):
        sparql_select(rd.from_arrow(QUADS),
                      "SELECT ?a ?c WHERE { ?a ?p ?b . ?c ?q ?d . }")


def test_docs_sparql_driver_query(ray_session):
    """The registered flagship: SPARQL over the docs-derived KG at
    sf0.001 equals the full CTE+compiled-SQL oracle."""
    import duckdb

    import __ray_entry__ as em
    from k_gap_ray.pipelines.docs_kg import sql_docs_sparql

    eng = em.queries()["q_sparql_docs"]("/root/testdata/sf0.001").to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')")
    ora = con.execute(sql_docs_sparql(em.DOCS_SPARQL)).df()
    assert len(eng) == len(ora) > 0
    assert _hash_df(eng) == _hash_df(ora)


CONSTRUCT_QUERIES = [
    # vocabulary remap over a UNION solution
    'PREFIX p: <p:> CONSTRUCT { ?x <p:connected> ?v . } WHERE '
    '{ { ?x p:loc ?v . } UNION { ?x p:knows ?v . } }',
    # two templates incl. a constant-object typing triple; unbound
    # OPTIONAL var drops only ITS template instantiation
    'PREFIX p: <p:> CONSTRUCT { ?x <p:hasLoc> ?l . ?x <p:a> "node" . } '
    'WHERE { ?x p:knows ?y . OPTIONAL { ?x p:loc ?l . } }',
    # reverse-edge construction under a filter (dedup across solutions)
    'PREFIX p: <p:> CONSTRUCT { ?y <p:knownBy> ?x . } WHERE '
    '{ ?x p:knows ?y . FILTER (?x != ?y) }',
]


@pytest.mark.parametrize("query", CONSTRUCT_QUERIES)
def test_construct_backends_agree(ray_session, query):
    import duckdb
    import ray.data as rd

    from k_gap_ray.sparql import sparql_construct, sparql_construct_to_sql

    res = sparql_construct(rd.from_arrow(QUADS).repartition(3), query)
    mine = res.to_pandas()
    con = duckdb.connect()
    con.register("quads", QUADS.to_pandas())
    ora = con.execute(sparql_construct_to_sql(query)).df()
    assert len(mine) == len(ora) and len(mine) > 0
    assert sorted(mine.columns) == sorted(ora.columns)
    assert _hash_df(mine) == _hash_df(ora)


def test_construct_rejects_modifiers_and_unbound():
    from k_gap_ray.sparql import parse_sparql

    for q in [
        'PREFIX p: <p:> CONSTRUCT { ?x <p:y> ?z . } WHERE '
        '{ ?x p:knows ?y . }',                         # unbound ?z
        'PREFIX p: <p:> CONSTRUCT { ?x <p:y> ?y . } WHERE '
        '{ ?x p:knows ?y . } ORDER BY ?x LIMIT 2',     # modifiers
    ]:
        with pytest.raises(ValueError):
            parse_sparql(q)


def test_path_plus_absent_predicate_returns_empty(ray_session):
    """path+ over a predicate that matches no quads is an ordinary
    empty result, not a crash (empty edge set short-circuits the
    semi-naive closure)."""
    import ray.data as rd

    from k_gap_ray.sparql import sparql_select

    res = sparql_select(
        rd.from_arrow(QUADS).repartition(3),
        'PREFIX p: <p:> SELECT DISTINCT ?x ?y WHERE { ?x p:nope+ ?y . }')
    assert res.take_all() == []


def test_rdf_type_shorthand(ray_session):
    """`a` in the predicate position is rdf:type on both backends,
    and composes with paths (a/p:loc sequence)."""
    import duckdb
    import ray.data as rd

    from k_gap_ray.sparql import sparql_select, sparql_to_sql

    RT = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    quads = pa.table({
        "subj": ["e:a", "e:b", "c:Org", "e:a"],
        "pred": [RT, RT, "p:loc", "p:loc"],
        "obj": ["c:Org", "c:Person", "l:bay", "l:shelf"],
        "graph": ["g"] * 4})
    for q in ('SELECT ?x WHERE { ?x a <c:Org> . }',
              'PREFIX p: <p:> SELECT ?x ?l WHERE { ?x a/p:loc ?l . }'):
        eng = sparql_select(rd.from_arrow(quads).repartition(2), q)
        got = sorted(map(str, (tuple(sorted(r.items()))
                               for r in eng.take_all())))
        con = duckdb.connect()
        con.register("quads", quads)
        ora = con.execute(sparql_to_sql(q)).df()
        exp = sorted(map(str, (tuple(sorted(r.items()))
                               for r in ora.to_dict("records"))))
        assert got == exp and len(got) >= 1


def test_absent_path_plus_joined_with_pattern(ray_session):
    """Absent-predicate path+ joined with another pattern (and under
    OPTIONAL) yields the SQL backend's result instead of crashing:
    the empty closure scan must carry the PATTERN's variable columns,
    not the internal closure schema."""
    import duckdb
    import ray.data as rd

    from k_gap_ray.sparql import sparql_select, sparql_to_sql

    for q, nexp in (
        ('PREFIX p: <p:> SELECT ?x ?l ?y WHERE '
         '{ ?x p:loc ?l . ?x p:nope+ ?y . }', 0),
        ('PREFIX p: <p:> SELECT ?x ?l ?y WHERE '
         '{ ?x p:loc ?l . OPTIONAL { ?x p:nope+ ?y . } }', 3),
    ):
        eng = sparql_select(rd.from_arrow(QUADS).repartition(3), q)
        rows = eng.take_all()
        con = duckdb.connect()
        con.register("quads", QUADS)
        ora = con.execute(sparql_to_sql(q)).df()
        assert len(rows) == len(ora) == nexp


def test_rdf_type_shorthand_in_construct(ray_session):
    """`a` works in CONSTRUCT template predicate positions too."""
    import ray.data as rd

    from k_gap_ray.sparql import sparql_construct

    RT = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    out = sparql_construct(
        rd.from_arrow(QUADS),
        'PREFIX p: <p:> CONSTRUCT { ?x a <c:Knower> . } '
        'WHERE { ?x p:knows ?y . }').take_all()
    assert len(out) == 3  # distinct knowers: e:a, e:b, e:d
    assert all(r["pred"] == RT and r["obj"] == "c:Knower" for r in out)


def test_ask_backends_agree(ray_session):
    """ASK queries agree with the SELECT EXISTS oracle, for both
    true and false answers, including a path-closure body."""
    import duckdb
    import ray.data as rd

    from k_gap_ray.sparql import sparql_ask, sparql_ask_to_sql

    con = duckdb.connect()
    con.register("quads", QUADS)
    ds = rd.from_arrow(QUADS).repartition(3)
    for q in ('PREFIX p: <p:> ASK { ?x p:knows ?x . }',        # true
              'PREFIX p: <p:> ASK { ?x p:loc "l:nowhere" . }',  # false
              'PREFIX p: <p:> ASK { ?x p:knows+ ?x . }'):       # cycle
        got = sparql_ask(ds, q)
        exp = bool(con.execute(sparql_ask_to_sql(q)).fetchone()[0])
        assert got == exp, q


def test_constant_ask_and_runtime_empty_relations(ray_session):
    """Review regressions: (1) an all-constant ASK preserves the match
    count through the dummy-column scan on Ray and compiles to a valid
    SELECT 1 relation in SQL; (2) relations emptied at RUNTIME (filter
    inside OPTIONAL, join-to-zero before NOT EXISTS) give the SQL
    backend's answer instead of crashing the hash join; (3) GRAPH
    over a graph-less dataset raises a contract ValueError."""
    import duckdb
    import ray.data as rd

    from k_gap_ray.sparql import (sparql_ask, sparql_ask_to_sql,
                                  sparql_select, sparql_to_sql)

    ds = rd.from_arrow(QUADS).repartition(3)
    con = duckdb.connect()
    con.register("quads", QUADS)
    for q, exp in (("ASK { <e:a> <p:knows> <e:b> . }", True),
                   ("ASK { <e:a> <p:knows> <e:z> . }", False)):
        assert sparql_ask(ds, q) is exp
        assert bool(con.execute(sparql_ask_to_sql(q)).fetchone()[0]) is exp
    for q in (
        'PREFIX p: <p:> SELECT ?x ?l WHERE { ?x p:knows ?y . OPTIONAL '
        '{ ?x p:loc ?l . FILTER (CONTAINS(?l, "nowhere")) } }',
        'PREFIX p: <p:> SELECT ?x WHERE { ?x p:emp ?e . ?x p:knows ?k .'
        ' FILTER (?e = "nope") FILTER NOT EXISTS { ?x p:loc ?l . } }',
    ):
        eng = sparql_select(ds, q).take_all()
        ora = con.execute(sparql_to_sql(q)).fetchall()
        assert len(eng) == len(ora)
    tri = rd.from_arrow(QUADS.drop_columns(["graph"]))
    with pytest.raises(ValueError, match="graph"):
        sparql_select(
            tri, "SELECT ?g WHERE { GRAPH ?g { ?s <p:loc> ?o . } }")


# quads with literal metadata: DESCRIBE must exclude literal objects
# from the backlink side even when a literal string equals an IRI
DESCRIBE_QUADS = pa.table({
    "subj": ["e:a", "e:a", "e:b", "e:c", "e:c", "e:d"],
    "pred": ["p:loc", "p:knows", "p:loc", "p:label", "p:knows",
             "p:knows"],
    "obj": ["l:bay", "e:b", "l:shelf", "e:b", "e:b", "e:a"],
    "obj_is_literal": [True, False, True, True, False, False],
    "graph": ["g"] * 6,
    "obj_lang": [""] * 6,
})

DESCRIBE_QUERIES = [
    "DESCRIBE <e:b>",
    "DESCRIBE <e:a> <e:c>",
    'PREFIX p: <p:> DESCRIBE ?x WHERE { ?x p:loc ?l . '
    'FILTER (STRENDS(?l, "bay")) }',
    'PREFIX p: <p:> DESCRIBE <e:d> ?x WHERE { ?x p:knows "e:b" . }',
]


@pytest.mark.parametrize("query", DESCRIBE_QUERIES)
def test_describe_backends_agree(ray_session, query):
    import duckdb
    import ray.data as rd

    from k_gap_ray.sparql import sparql_describe, sparql_describe_to_sql

    eng = sparql_describe(
        rd.from_arrow(DESCRIBE_QUADS).repartition(2), query).to_pandas()
    con = duckdb.connect()
    con.register("quads", DESCRIBE_QUADS)
    ora = con.execute(sparql_describe_to_sql(query)).df()
    assert len(eng) == len(ora) > 0
    assert _hash_df(eng) == _hash_df(ora)
    # p:label "e:b" is a LITERAL equal to the described IRI: it must
    # never be picked up as a backlink (only IRI objects backlink)
    if query == "DESCRIBE <e:b>":
        assert "p:label" not in set(
            eng.loc[eng["obj"] == "e:b", "pred"])


def test_describe_requires_literal_metadata(ray_session):
    import ray.data as rd

    from k_gap_ray.sparql import sparql_describe

    with pytest.raises(ValueError, match="obj_is_literal"):
        sparql_describe(
            rd.from_arrow(QUADS.drop_columns(["obj_is_literal"])),
            "DESCRIBE <e:b>")
