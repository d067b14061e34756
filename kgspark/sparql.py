"""SPARQL text front-end (SURVEY D5 consumer side): parse a SPARQL
SELECT subset into the relational BGP machinery (kgspark/bgp.py) —
the store's query surface as upstream consumers actually write it
(the RES stack / `bbcarchdev/quilt` `[U~]` issued textual SPARQL).

Supported subset::

    SELECT [DISTINCT] (?v ... | * | (AGG([DISTINCT] ?v | *) AS ?a) ...)
    WHERE { group [ UNION { group } ... ] }
    [GROUP BY ?v ...] [HAVING ( expr )]
    [ORDER BY (?v | ASC(?v) | DESC(?v)) ...] [LIMIT n] [OFFSET n]

    AGG := COUNT | SUM | MIN | MAX   (SUM casts to BIGINT — exact on
    every engine; AVG rejected: float aggregate)

    CONSTRUCT { template-patterns } WHERE { group }
    ASK [WHERE] { group }
    DESCRIBE (<iri>... | ?v ... WHERE { group })

    group := ( triple-pattern '.'
             | GRAPH (?g | iri) { triple-patterns }
             | OPTIONAL { triple-patterns }
             | FILTER [NOT] EXISTS { triple-patterns }
             | MINUS { triple-patterns }
             | FILTER ( expression )
             | BIND ( expression AS ?v )
             | VALUES ?v { lit ... }
             | VALUES (?a ?b ...) { (lit lit ...) ... } )*

    Functions: REGEX, STR, xsd:integer, CONTAINS, STRSTARTS, STRENDS,
    STRLEN, UCASE, LCASE, LANG (requires a full-term (s,p,o,o_kind,
    o_lang,o_datatype) input frame — e.g. kg_triples_full).

Triple patterns may use property paths (``pred+``, ``(pred|^pred)+``).
FILTER expressions support ?var references, comparison operators,
``&&``/``||``/``!``, ``REGEX(?v, "pat")``, ``STR(?v)``,
``xsd:integer(?v)`` casts, and string/number literals — translated to
Spark SQL expression strings, so they stay in whole-stage codegen and
Catalyst pushes single-variable predicates into the pattern scans.

The parser is driver-side work over a query STRING (bytes of config,
not data) — the resulting plan is exactly the bgp_match plan.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bgp import bgp_match, bgp_union

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<str>"(?:[^"\\]|\\.)*")
      | (?P<punct><=|>=|!=|&&|\|\||[{}().,<>=!*])
      | (?P<word>[^\s{}().,<>=!"]+)
    )""",
    re.VERBOSE,
)


def _tokenize(q: str) -> list[str]:
    q = q.strip()
    toks, i = [], 0
    while i < len(q):
        m = _TOKEN.match(q, i)
        if not m:
            raise ValueError(f"SPARQL tokenizer stuck at: {q[i:i+30]!r}")
        if m.end() == m.start():
            break
        toks.append(m.group("str") or m.group("punct") or m.group("word"))
        i = m.end()
    return toks


class _P:
    """Recursive-descent parser over the token stream."""

    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self, k: int = 0) -> str | None:
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else None

    def kw(self, word: str) -> bool:
        t = self.peek()
        if t is not None and t.upper() == word:
            self.i += 1
            return True
        return False

    def expect(self, word: str) -> None:
        if not self.kw(word):
            raise ValueError(
                f"SPARQL parse error: expected {word!r} at {self.peek()!r}"
            )

    def take(self) -> str:
        t = self.peek()
        if t is None:
            raise ValueError("SPARQL parse error: unexpected end of query")
        self.i += 1
        return t


def _parse_patterns(p: _P) -> list[tuple[str, str, str]]:
    """Triple patterns up to the closing '}' (not consumed)."""
    pats = []
    while p.peek() not in ("}", None):
        up = (p.peek() or "").upper()
        if up in ("OPTIONAL", "FILTER", "UNION", "VALUES", "BIND", "MINUS",
                  "GRAPH"):
            break
        s = p.take()
        if p.peek() == "(":
            # symmetric path (pred|^pred)+ — the tokenizer splits the
            # parens off; reassemble the path term
            p.take()
            inner = p.take()
            p.expect(")")
            plus = p.take()
            if plus != "+":
                raise ValueError("path group must be followed by '+'")
            pred = f"({inner})+"
        else:
            pred = p.take()
            if pred == "a":  # SPARQL rdf:type shorthand
                pred = "rdf:type"
        o = p.take()
        p.kw(".")  # trailing dot optional before }
        pats.append((_term(s), _term(pred), _term(o)))
    return pats


def _term(tok: str) -> str:
    if tok.startswith('"') and tok.endswith('"'):
        return tok[1:-1]
    return tok


_VAR = re.compile(r"\?([A-Za-z_][A-Za-z0-9_]*)")


def _arg_sql(p: _P) -> str:
    """One function argument: variable, string literal, or number."""
    t = p.take()
    if t.startswith("?"):
        return _VAR.fullmatch(t).group(1)
    if t.startswith('"'):
        return "'" + _term(t).replace("'", "''") + "'"
    return t


def _expr_to_sql(p: _P, until_as: bool = False) -> str:
    """Consume a parenthesized expression, translating SPARQL operators
    and functions to Spark SQL.  With ``until_as``, stop (and consume)
    at a top-level AS instead of the closing paren — the BIND form."""
    p.expect("(")
    depth, parts = 1, []
    while depth > 0:
        if until_as and depth == 1 and (p.peek() or "").upper() == "AS":
            p.take()
            break
        t = p.take()
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
            if depth == 0:
                break
        up = t.upper()
        if up == "&&":
            parts.append("AND")
        elif up == "||":
            parts.append("OR")
        elif t == "!" and p.peek() != "=":
            parts.append("NOT")
        elif up == "REGEX":
            # REGEX(?v, "pat") → v rlike 'pat'
            p.expect("(")
            var = _VAR.fullmatch(p.take())
            if not var:
                raise ValueError("REGEX first argument must be a variable")
            p.expect(",")
            pat = p.take()
            p.expect(")")
            parts.append(f"{var.group(1)} rlike '{_term(pat)}'")
        elif up == "STR":
            p.expect("(")
            var = _VAR.fullmatch(p.take())
            p.expect(")")
            parts.append(f"CAST({var.group(1)} AS STRING)")
        elif up == "LANG":
            # LANG(?v) → the hidden language column carried by
            # full-term inputs (empty string for plain literals/IRIs,
            # matching SPARQL's "" for no language tag)
            p.expect("(")
            var = _VAR.fullmatch(p.take())
            p.expect(")")
            parts.append(f"coalesce(__lang_{var.group(1)}, '')")
        elif up in ("XSD:INTEGER", "XSD:INT"):
            p.expect("(")
            var = _VAR.fullmatch(p.take())
            p.expect(")")
            parts.append(f"CAST({var.group(1)} AS INT)")
        elif up in ("CONTAINS", "STRSTARTS", "STRENDS"):
            fn = {"CONTAINS": "contains", "STRSTARTS": "startswith",
                  "STRENDS": "endswith"}[up]
            p.expect("(")
            a = _arg_sql(p)
            p.expect(",")
            b = _arg_sql(p)
            p.expect(")")
            parts.append(f"{fn}({a}, {b})")
        elif up in ("STRLEN", "UCASE", "LCASE"):
            fn = {"STRLEN": "length", "UCASE": "upper", "LCASE": "lower"}[up]
            p.expect("(")
            a = _arg_sql(p)
            p.expect(")")
            parts.append(f"{fn}({a})")
        elif t.startswith("?"):
            v = _VAR.fullmatch(t)
            if not v:
                raise ValueError(f"bad variable {t!r}")
            parts.append(v.group(1))
        elif t.startswith('"'):
            parts.append("'" + _term(t).replace("'", "''") + "'")
        else:
            parts.append(t)
    return " ".join(parts)


def _parse_group(p: _P) -> dict:
    """One { ... } group body → bgp_match kwargs (brace not consumed
    at entry; closing brace consumed)."""
    p.expect("{")
    patterns: list = []
    optionals: list = []
    anti: list = []
    exists: list = []
    filters: list[str] = []
    binds: list[tuple[str, str]] = []
    values: list[tuple[list[str], list[tuple]]] = []
    while True:
        t = p.peek()
        if t is None:
            raise ValueError("SPARQL parse error: unclosed group")
        if t == "}":
            p.take()
            break
        up = t.upper()
        if up == "VALUES":
            p.take()
            if p.peek() == "(":
                p.take()
                varnames = []
                while p.peek() != ")":
                    varnames.append(_VAR.fullmatch(p.take()).group(1))
                p.expect(")")
                p.expect("{")
                rows = []
                while p.peek() == "(":
                    p.take()
                    row = []
                    while p.peek() != ")":
                        row.append(_term(p.take()))
                    p.expect(")")
                    rows.append(tuple(row))
                p.expect("}")
            else:
                varnames = [_VAR.fullmatch(p.take()).group(1)]
                p.expect("{")
                rows = []
                while p.peek() != "}":
                    rows.append((_term(p.take()),))
                p.expect("}")
            values.append((varnames, rows))
        elif up == "GRAPH":
            # GRAPH (?g | iri) { patterns } → 4-term quad patterns
            p.take()
            gterm = _term(p.take())
            p.expect("{")
            inner = _parse_patterns(p)
            p.expect("}")
            patterns.extend([(gterm,) + pat for pat in inner])
        elif up == "BIND":
            p.take()
            expr = _expr_to_sql(p, until_as=True)
            var = _VAR.fullmatch(p.take()).group(1)
            p.expect(")")
            binds.append((expr, var))
        elif up == "MINUS":
            # SPARQL MINUS: for groups sharing (non-NULL) variables this
            # subset is exactly the NOT-EXISTS anti-join
            p.take()
            p.expect("{")
            anti.append(_parse_patterns(p))
            p.expect("}")
        elif up == "OPTIONAL":
            p.take()
            p.expect("{")
            optionals.append(_parse_patterns(p))
            p.expect("}")
        elif up == "FILTER":
            p.take()
            nxt = (p.peek() or "").upper()
            if nxt == "NOT":
                p.take()
                p.expect("EXISTS")
                p.expect("{")
                anti.append(_parse_patterns(p))
                p.expect("}")
            elif nxt == "EXISTS":
                p.take()
                p.expect("{")
                exists.append(_parse_patterns(p))
                p.expect("}")
            else:
                filters.append(_expr_to_sql(p))
        else:
            got = _parse_patterns(p)
            if not got:
                raise ValueError(f"SPARQL parse error at {p.peek()!r}")
            patterns.extend(got)
    out: dict = {"patterns": patterns}
    if optionals:
        out["optionals"] = optionals
    if anti:
        out["anti"] = anti
    if exists:
        out["exists"] = exists
    if filters:
        out["filters"] = filters
    if binds:
        out["binds"] = binds
    if values:
        out["values"] = values
    return out


def parse_sparql(q: str) -> dict:
    """Parse the SELECT subset → a spec dict (inspectable, testable)."""
    p = _P(_tokenize(q))
    p.expect("SELECT")
    distinct = p.kw("DISTINCT")
    select: list[str] | None = []
    aggregates: list[tuple[str, bool, str | None, str]] = []
    if p.kw("*"):
        select = None
    else:
        while True:
            t = p.peek() or ""
            if t.startswith("?"):
                select.append(_VAR.fullmatch(p.take()).group(1))
            elif t == "(":
                # (AGG([DISTINCT] ?v | *) AS ?alias)
                p.take()
                fn = p.take().upper()
                if fn not in ("COUNT", "SUM", "MIN", "MAX", "AVG"):
                    raise ValueError(f"unsupported aggregate {fn!r}")
                p.expect("(")
                agg_distinct = p.kw("DISTINCT")
                arg = None if p.kw("*") else _VAR.fullmatch(p.take()).group(1)
                p.expect(")")
                p.expect("AS")
                alias = _VAR.fullmatch(p.take()).group(1)
                p.expect(")")
                if arg is None and fn != "COUNT":
                    raise ValueError(f"{fn}(*) is not valid SPARQL")
                aggregates.append((fn, agg_distinct, arg, alias))
            else:
                break
        if not select and not aggregates:
            raise ValueError("SELECT needs variables, aggregates or *")
    p.expect("WHERE")
    groups = [_parse_group(p)]
    while (p.peek() or "").upper() == "UNION":
        p.take()
        groups.append(_parse_group(p))

    group_by: list[str] = []
    having: list[str] = []
    if (p.peek() or "").upper() == "GROUP":
        p.take()
        p.expect("BY")
        while (p.peek() or "").startswith("?"):
            group_by.append(_VAR.fullmatch(p.take()).group(1))
        if not group_by:
            raise ValueError("GROUP BY needs variables")
    if (p.peek() or "").upper() == "HAVING":
        p.take()
        having.append(_expr_to_sql(p))

    order: list[tuple[str, bool]] = []
    if (p.peek() or "").upper() == "ORDER":
        p.take()
        p.expect("BY")
        while True:
            t = p.peek()
            if t is None:
                break
            up = t.upper()
            if up in ("ASC", "DESC"):
                p.take()
                p.expect("(")
                v = _VAR.fullmatch(p.take()).group(1)
                p.expect(")")
                order.append((v, up == "DESC"))
            elif t.startswith("?"):
                order.append((_VAR.fullmatch(p.take()).group(1), False))
            else:
                break
    limit = offset = None
    if (p.peek() or "").upper() == "LIMIT":
        p.take()
        limit = int(p.take())
    if (p.peek() or "").upper() == "OFFSET":
        p.take()
        offset = int(p.take())
    if p.peek() is not None:
        raise ValueError(f"SPARQL parse error: trailing {p.peek()!r}")
    return {
        "distinct": distinct,
        "select": select,
        "aggregates": aggregates,
        "group_by": group_by,
        "having": having,
        "groups": groups,
        "order": order,
        "limit": limit,
        "offset": offset,
    }


def sparql_select(
    triples: DataFrame, query: str, allow_product: bool = False
) -> DataFrame:
    """Execute a SPARQL SELECT (subset) against a (s,p,o) DataFrame.

    ORDER BY + LIMIT compile to orderBy().limit() — Spark plans that as
    TakeOrdered (per-partition top-k, no global sort).  Without ORDER
    BY the solution sequence is unordered, as in SPARQL."""
    spec = parse_sparql(query)
    if len(spec["groups"]) == 1:
        g = dict(spec["groups"][0])
        g["allow_product"] = allow_product
        out = bgp_match(triples, **g)
    else:
        gs = [dict(g, allow_product=allow_product) for g in spec["groups"]]
        out = bgp_union(triples, gs)
    if spec["aggregates"]:
        # SPARQL aggregation: GROUP BY keys must cover every bare
        # SELECT variable.  SUM casts its argument to BIGINT (the
        # store's literals ride as strings; an integer sum is exact on
        # every engine, a float sum is not — AVG is rejected for the
        # same reason).  Aggregates are map-side-combinable, so this
        # plans as partial + final hash aggregate around one shuffle.
        stray = [v for v in (spec["select"] or []) if v not in spec["group_by"]]
        if stray:
            raise ValueError(f"SELECT variables not in GROUP BY: {stray}")
        aggs = []
        for fn, agg_distinct, arg, alias in spec["aggregates"]:
            if fn == "AVG":
                raise ValueError(
                    "AVG is not supported (float aggregate — use "
                    "SUM and COUNT and divide downstream)"
                )
            if fn == "COUNT" and arg is None:
                c = F.count(F.lit(1))
            elif fn == "COUNT":
                c = (
                    F.countDistinct(arg)
                    if agg_distinct
                    else F.count(F.col(arg))
                )
            elif fn == "SUM":
                col = F.col(arg).cast("bigint")
                c = F.sum_distinct(col) if agg_distinct else F.sum(col)
            else:  # MIN / MAX — distinct is a no-op
                c = getattr(F, fn.lower())(F.col(arg))
            aggs.append(c.alias(alias))
        out = out.groupBy(*spec["group_by"]).agg(*aggs)
        if spec["select"]:
            out = out.select(
                *spec["select"],
                *[a for _, _, _, a in spec["aggregates"]],
            )
        for h in spec["having"]:
            out = out.filter(F.expr(h))
    elif spec["select"] is not None:
        missing = [v for v in spec["select"] if v not in out.columns]
        if missing:
            raise ValueError(f"SELECT variables not bound: {missing}")
        out = out.select(*spec["select"])
    if spec["distinct"]:
        out = out.distinct()
    if spec["order"]:
        out = out.orderBy(
            *[F.desc(v) if d else F.asc(v) for v, d in spec["order"]]
        )
    if spec["offset"]:
        out = out.offset(spec["offset"])
    if spec["limit"] is not None:
        out = out.limit(spec["limit"])
    return out


def sparql_construct(
    triples: DataFrame, query: str, allow_product: bool = False
) -> DataFrame:
    """Execute a SPARQL CONSTRUCT (subset)::

        CONSTRUCT { template patterns } WHERE { group }

    Returns the constructed GRAPH — distinct (s, p, o); template
    instances with an unbound variable are dropped (spec semantics)."""
    from .bgp import bgp_construct

    p = _P(_tokenize(query))
    p.expect("CONSTRUCT")
    p.expect("{")
    template = _parse_patterns(p)
    p.expect("}")
    p.expect("WHERE")
    g = _parse_group(p)
    if p.peek() is not None:
        raise ValueError(f"SPARQL parse error: trailing {p.peek()!r}")
    return bgp_construct(
        triples, template, allow_product=allow_product, **g
    )


def sparql_ask(
    triples: DataFrame, query: str, allow_product: bool = False
) -> DataFrame:
    """Execute a SPARQL ASK (subset): ``ASK [WHERE] { group }`` →
    one row ``(ask: boolean)``."""
    from .bgp import bgp_ask

    p = _P(_tokenize(query))
    p.expect("ASK")
    p.kw("WHERE")
    g = _parse_group(p)
    if p.peek() is not None:
        raise ValueError(f"SPARQL parse error: trailing {p.peek()!r}")
    return bgp_ask(triples, allow_product=allow_product, **g)


def store_sparql(
    spark,
    path: str,
    query: str,
    graph=None,
    allow_product: bool = False,
) -> DataFrame:
    """SPARQL over the per-graph partitioned N-Quads file store
    (rdfio.write_nquads_store) — the D5/D6 store consumed through its
    query surface.

    ``graph`` (IRI or list) is the graph-scoped fetch: the predicate is
    applied to the RAW partition column inside read_nquads_store, so it
    prunes to the requested graphs' directories BEFORE the parse kernel
    runs (filters do not push through MapInPandas; plan-gated in
    tests).  The queried default graph is the RDF MERGE of the selected
    graphs (set semantics — distinct before matching)."""
    from .rdfio import read_nquads_store

    quads = read_nquads_store(spark, path, graph=graph)
    triples = quads.select("s", "p", "o").distinct()
    verb = (_tokenize(query) or [""])[0].upper()
    if verb == "SELECT":
        return sparql_select(triples, query, allow_product=allow_product)
    if verb == "CONSTRUCT":
        return sparql_construct(triples, query, allow_product=allow_product)
    if verb == "ASK":
        return sparql_ask(triples, query, allow_product=allow_product)
    if verb == "DESCRIBE":
        return sparql_describe(triples, query, allow_product=allow_product)
    raise ValueError(f"unsupported SPARQL verb: {verb!r}")


def sparql_describe(
    triples: DataFrame, query: str, allow_product: bool = False
) -> DataFrame:
    """SPARQL DESCRIBE (subset — outgoing-edge description):
    ``DESCRIBE iri ...`` or ``DESCRIBE ?v ... WHERE { group }``.
    Returns every (s, p, o) whose subject is a described resource —
    one semi-join against the (distinct) subject set, no collect."""
    p = _P(_tokenize(query))
    p.expect("DESCRIBE")
    consts: list[str] = []
    vars_: list[str] = []
    while p.peek() is not None and (p.peek() or "").upper() != "WHERE":
        t = p.take()
        if t.startswith("?"):
            vars_.append(_VAR.fullmatch(t).group(1))
        else:
            consts.append(_term(t))
    if not consts and not vars_:
        raise ValueError("DESCRIBE needs resources or variables")
    spark = triples.sparkSession
    t = triples
    if "g" in t.columns:
        t = t.select("s", "p", "o").distinct()
    subjects = None
    if consts:
        subjects = spark.createDataFrame([(c,) for c in consts], "subj string")
    if vars_:
        if (p.peek() or "").upper() != "WHERE":
            raise ValueError("DESCRIBE with variables needs a WHERE group")
        p.expect("WHERE")
        g = _parse_group(p)
        sol = bgp_match(triples, allow_product=allow_product, **g)
        for v in vars_:
            if v not in sol.columns:
                raise ValueError(f"DESCRIBE variable ?{v} not bound")
            sv = sol.select(F.col(v).alias("subj"))
            subjects = sv if subjects is None else subjects.unionByName(sv)
    if p.peek() is not None:
        raise ValueError(f"SPARQL parse error: trailing {p.peek()!r}")
    return t.join(
        subjects.distinct(), t["s"] == F.col("subj"), "left_semi"
    )
