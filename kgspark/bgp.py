"""SPARQL basic-graph-pattern matching over the triple table
(SURVEY.md D5 consumer side; the RES stack queried Twine's store via
SPARQL — bbcarchdev/quilt `[U~]`).  This is the S2RDF-style relational
encoding of BGP evaluation: each triple pattern is a filtered scan of
the triples DataFrame, variables become projected columns, and shared
variables between patterns become equi-join keys.

Scale shape: constants in a pattern are pushed-down filters on the
(columnar, partitioned) triple table; the join chain is left to
Catalyst/AQE — selective patterns broadcast, unselective ones shuffle
on the variable column.  No driver-side evaluation of any kind.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bgp_match(triples: DataFrame, patterns: list[tuple[str, str, str]]) -> DataFrame:
    """Match a conjunctive BGP against a (s, p, o) DataFrame.

    ``patterns`` — list of (s, p, o) terms; a term starting with ``?``
    is a variable (bound across patterns), anything else is a constant.
    Returns one column per distinct variable; rows = all bindings.

    Example::

        bgp_match(t, [("?e", "rdf:type", "ex:Commerce"),
                      ("?e", "rdfs:label", "?l")])
        # → DataFrame(e, l)
    """
    if not patterns:
        raise ValueError("empty BGP")
    bound: DataFrame | None = None
    for pat in patterns:
        if len(pat) != 3:
            raise ValueError(f"triple pattern must have 3 terms: {pat!r}")
        t = triples
        proj = []
        seen_in_pattern: dict[str, str] = {}
        for col, term in zip(["s", "p", "o"], pat):
            if term.startswith("?"):
                var = term[1:]
                if not var:
                    raise ValueError("bare '?' variable")
                if var in seen_in_pattern:
                    # repeated variable WITHIN one pattern: equality
                    t = t.filter(F.col(col) == F.col(seen_in_pattern[var]))
                else:
                    seen_in_pattern[var] = col
                    proj.append(F.col(col).alias(var))
            else:
                t = t.filter(F.col(col) == term)
        t = t.select(*proj) if proj else t.select(F.lit(1).alias("_match")).limit(1)
        if bound is None:
            bound = t
        else:
            shared = [c for c in t.columns if c in bound.columns]
            bound = bound.join(t, shared) if shared else bound.crossJoin(t)
    return bound
