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


def _pattern_frame(triples: DataFrame, pat: tuple[str, str, str]) -> DataFrame:
    """One triple pattern → filtered scan projecting its variables."""
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
    return t.select(*proj) if proj else t.select(F.lit(1).alias("_match")).limit(1)


def _conjunction(triples: DataFrame, patterns) -> DataFrame:
    bound: DataFrame | None = None
    for pat in patterns:
        t = _pattern_frame(triples, pat)
        if bound is None:
            bound = t
        else:
            shared = [c for c in t.columns if c in bound.columns]
            bound = bound.join(t, shared) if shared else bound.crossJoin(t)
    return bound


def bgp_match(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    optionals: list[list[tuple[str, str, str]]] | None = None,
    anti: list[list[tuple[str, str, str]]] | None = None,
) -> DataFrame:
    """Match a BGP against a (s, p, o) DataFrame.

    ``patterns`` — required conjunctive patterns; a term starting with
    ``?`` is a variable (bound across patterns), anything else a
    constant.  Returns one column per distinct variable.

    ``optionals`` — list of OPTIONAL groups: each group is itself a
    conjunctive pattern list, LEFT-joined on its shared variables
    (SPARQL OPTIONAL: unmatched bindings surface as NULL).

    ``anti`` — list of FILTER-NOT-EXISTS groups: bindings for which the
    group matches are REMOVED (left-anti join on shared variables).

    Example::

        bgp_match(t, [("?e", "rdf:type", "ex:Commerce")],
                  optionals=[[("?e", "rdfs:label", "?l")]],
                  anti=[[("?e", "ex:retired", "?any")]])
    """
    if not patterns:
        raise ValueError("empty BGP")
    bound = _conjunction(triples, patterns)
    for group in anti or []:
        g = _conjunction(triples, group)
        shared = [c for c in g.columns if c in bound.columns]
        if not shared:
            raise ValueError("NOT-EXISTS group shares no variable with the BGP")
        bound = bound.join(g.select(*shared).distinct(), shared, "left_anti")
    for group in optionals or []:
        g = _conjunction(triples, group)
        shared = [c for c in g.columns if c in bound.columns]
        if not shared:
            raise ValueError("OPTIONAL group shares no variable with the BGP")
        bound = bound.join(g, shared, "left")
    return bound
