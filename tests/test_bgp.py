"""SPARQL BGP matcher semantics on a synthetic triple table."""

from __future__ import annotations

import pytest

from kgspark.bgp import bgp_match

TRIPLES = [
    ("ex:a", "rdf:type", "ex:Person"),
    ("ex:a", "rdfs:label", "alice"),
    ("ex:a", "ex:knows", "ex:b"),
    ("ex:b", "rdf:type", "ex:Person"),
    ("ex:b", "rdfs:label", "bob"),
    ("ex:b", "ex:knows", "ex:a"),
    ("ex:c", "rdf:type", "ex:Robot"),
    ("ex:c", "rdfs:label", "carl"),
    ("ex:self", "ex:knows", "ex:self"),
]


@pytest.fixture()
def tri(spark):
    return spark.createDataFrame(TRIPLES, "s string, p string, o string")


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_constants_filter_and_vars_project(tri):
    out = bgp_match(tri, [("?e", "rdf:type", "ex:Person"), ("?e", "rdfs:label", "?l")])
    assert set(out.columns) == {"e", "l"}
    assert _rows(out.select("e", "l")) == {("ex:a", "alice"), ("ex:b", "bob")}


def test_join_chain_three_patterns(tri):
    out = bgp_match(
        tri,
        [
            ("?x", "ex:knows", "?y"),
            ("?x", "rdfs:label", "?lx"),
            ("?y", "rdfs:label", "?ly"),
        ],
    )
    assert _rows(out.select("x", "y", "lx", "ly")) == {
        ("ex:a", "ex:b", "alice", "bob"),
        ("ex:b", "ex:a", "bob", "alice"),
    }


def test_variable_in_predicate_position(tri):
    out = bgp_match(tri, [("ex:c", "?p", "?o")])
    assert _rows(out.select("p", "o")) == {
        ("rdf:type", "ex:Robot"),
        ("rdfs:label", "carl"),
    }


def test_repeated_variable_within_pattern(tri):
    # {?x ex:knows ?x} — only the self-loop matches
    out = bgp_match(tri, [("?x", "ex:knows", "?x")])
    assert _rows(out.select("x")) == {("ex:self",)}


def test_disjoint_patterns_cross_product(tri):
    out = bgp_match(
        tri, [("ex:a", "rdfs:label", "?la"), ("ex:c", "rdfs:label", "?lc")],
        allow_product=True,
    )
    assert _rows(out.select("la", "lc")) == {("alice", "carl")}


def test_disjoint_patterns_refused_without_opt_in(tri):
    # round-3 verdict #3: a stray disjoint pattern at store scale is a
    # corpus² product — refuse unless the caller opts in
    with pytest.raises(ValueError, match="allow_product"):
        bgp_match(tri, [("ex:a", "rdfs:label", "?la"), ("ex:c", "rdfs:label", "?lc")])


def test_empty_bgp_raises(tri):
    with pytest.raises(ValueError):
        bgp_match(tri, [])


def test_optional_binds_null_when_unmatched(tri):
    out = bgp_match(
        tri,
        [("?x", "rdf:type", "?t")],
        optionals=[[("?x", "ex:knows", "?y")]],
    )
    rows = _rows(out.select("x", "t", "y"))
    assert ("ex:a", "ex:Person", "ex:b") in rows
    assert ("ex:c", "ex:Robot", None) in rows  # carl knows nobody


def test_not_exists_removes_bindings(tri):
    out = bgp_match(
        tri,
        [("?x", "rdf:type", "?t")],
        anti=[[("?x", "ex:knows", "?y")]],
    )
    assert _rows(out.select("x")) == {("ex:c",)}


def test_optional_after_anti_compose(tri):
    out = bgp_match(
        tri,
        [("?x", "rdfs:label", "?l")],
        anti=[[("?x", "rdf:type", "ex:Robot")]],
        optionals=[[("?x", "ex:knows", "?y")]],
    )
    rows = _rows(out.select("x", "l", "y"))
    assert rows == {
        ("ex:a", "alice", "ex:b"),
        ("ex:b", "bob", "ex:a"),
    }


def test_disjoint_optional_raises(tri):
    with pytest.raises(ValueError):
        bgp_match(tri, [("?x", "rdf:type", "?t")],
                  optionals=[[("ex:a", "rdfs:label", "?only")]])


# --- round-4 surface: gates, FILTER, SELECT/DISTINCT, UNION, paths ----------
def test_constant_only_pattern_gates_without_leaking(tri):
    # existing triple → gate passes, and NO helper column in the output
    out = bgp_match(
        tri, [("ex:a", "rdf:type", "ex:Person"), ("?x", "rdf:type", "ex:Robot")]
    )
    assert set(out.columns) == {"x"}
    assert _rows(out) == {("ex:c",)}
    # missing triple → gate empties the result
    out2 = bgp_match(
        tri, [("ex:a", "rdf:type", "ex:Robot"), ("?x", "rdf:type", "ex:Robot")]
    )
    assert out2.count() == 0


def test_constant_only_pattern_first_position(tri):
    out = bgp_match(
        tri, [("?x", "rdf:type", "ex:Robot"), ("ex:a", "rdf:type", "ex:Person")]
    )
    assert set(out.columns) == {"x"}
    assert _rows(out) == {("ex:c",)}


def test_all_constant_bgp_is_ask(tri):
    assert bgp_match(tri, [("ex:a", "rdf:type", "ex:Person")]).columns == ["matched"]
    assert bgp_match(tri, [("ex:a", "rdf:type", "ex:Person")]).count() == 1
    assert bgp_match(tri, [("ex:a", "rdf:type", "ex:Robot")]).count() == 0


def test_constant_only_anti_group_is_valid_guard(tri):
    # round-3 ADVICE: constant-only NOT-EXISTS group is valid SPARQL —
    # empties the result iff the triple exists
    out = bgp_match(
        tri, [("?x", "rdf:type", "ex:Robot")],
        anti=[[("ex:a", "rdf:type", "ex:Person")]],
    )
    assert out.count() == 0
    out2 = bgp_match(
        tri, [("?x", "rdf:type", "ex:Robot")],
        anti=[[("ex:a", "rdf:type", "ex:Robot")]],
    )
    assert _rows(out2.select("x")) == {("ex:c",)}


def test_filter_and_select_distinct(tri):
    out = bgp_match(
        tri,
        [("?x", "rdf:type", "?t"), ("?x", "rdfs:label", "?l")],
        filters=["l rlike '^[ab]'"],
        select=["x", "l"],
        distinct=True,
    )
    assert out.columns == ["x", "l"]
    assert _rows(out) == {("ex:a", "alice"), ("ex:b", "bob")}


def test_filter_accepts_column_expr(tri):
    from pyspark.sql import functions as F

    out = bgp_match(
        tri, [("?x", "rdfs:label", "?l")], filters=[F.col("l") > "b"]
    )
    assert _rows(out.select("l")) == {("bob",), ("carl",)}


def test_select_unbound_variable_raises(tri):
    with pytest.raises(ValueError, match="not bound"):
        bgp_match(tri, [("?x", "rdfs:label", "?l")], select=["x", "nope"])


def test_union_pads_unshared_variables_with_null(tri):
    from kgspark.bgp import bgp_union

    out = bgp_union(
        tri,
        [
            {"patterns": [("?x", "rdf:type", "ex:Robot")]},
            {"patterns": [("?x", "ex:knows", "?y")],
             "filters": ["x = 'ex:a'"]},
        ],
    )
    assert set(out.columns) == {"x", "y"}
    assert _rows(out.select("x", "y")) == {("ex:c", None), ("ex:a", "ex:b")}


PATH_TRIPLES = [
    ("n1", "ex:next", "n2"),
    ("n2", "ex:next", "n3"),
    ("n3", "ex:next", "n4"),
    ("m1", "ex:next", "m2"),
    ("c1", "ex:next", "c2"),
    ("c2", "ex:next", "c1"),  # 2-cycle
    ("x1", "ex:other", "x2"),
]


@pytest.fixture()
def ptri(spark):
    return spark.createDataFrame(PATH_TRIPLES, "s string, p string, o string")


def test_directed_path_plus(ptri):
    out = bgp_match(ptri, [("?a", "ex:next+", "?b")])
    rows = _rows(out.select("a", "b"))
    assert ("n1", "n4") in rows          # length-3 path
    assert ("n1", "n2") in rows          # original edge kept
    assert ("n4", "n1") not in rows      # direction respected
    assert ("m1", "m2") in rows
    assert ("c1", "c1") in rows          # cycle ⇒ self pair
    assert ("x1", "x2") not in rows      # other predicate excluded
    assert len(rows) == 3 + 2 + 1 + 1 + 4  # n-chain closure 6, m 1, c 4


def test_directed_path_with_constant_endpoint(ptri):
    out = bgp_match(ptri, [("n1", "ex:next+", "?b")])
    assert _rows(out.select("b")) == {("n2",), ("n3",), ("n4",)}


def test_symmetric_path_closure(ptri):
    out = bgp_match(ptri, [("?a", "(ex:next|^ex:next)+", "?b")])
    rows = _rows(out.select("a", "b"))
    # within the n-chain component every ordered pair incl. self
    for a in ("n1", "n2", "n3", "n4"):
        for b in ("n1", "n2", "n3", "n4"):
            assert (a, b) in rows
    assert ("n1", "m1") not in rows
    assert ("m2", "m1") in rows          # reverse direction reachable


def test_path_joins_with_plain_pattern(ptri):
    out = bgp_match(
        ptri,
        [("?a", "ex:next+", "?b"), ("?b", "ex:next", "?c")],
        filters=["a = 'n1'"],
    )
    assert _rows(out.select("b", "c")) == {("n2", "n3"), ("n3", "n4")}


def test_transitive_pairs_deep_chain_doubling(spark):
    """A 200-edge chain closes in ⌈log2(200)⌉ = 8 doubling rounds —
    the O(log diameter) property that makes pred+ survive deep chains
    (a single-step semi-naive loop would need 200 rounds and a
    max_iter=40 ceiling would abort)."""
    from kgspark.bgp import transitive_pairs

    edges = spark.createDataFrame(
        [(f"v{i}", f"v{i+1}") for i in range(200)], "src string, dst string"
    )
    reach = transitive_pairs(edges, max_iter=10)  # 8 needed; 40 default
    n = reach.count()
    assert n == 200 * 201 // 2  # all (i < j) pairs of the 201-node chain


def test_bgp_differential_vs_naive_pandas(spark):
    """Differential gate: bgp_match vs an independent brute-force
    pandas evaluator on randomized pattern sets over a random graph
    (fixed seeds — deterministic)."""
    import itertools
    import random

    import pandas as pd

    rng = random.Random(20260817)
    nodes = [f"n{i}" for i in range(12)]
    preds = ["p0", "p1", "p2"]
    triples = sorted({
        (rng.choice(nodes), rng.choice(preds), rng.choice(nodes))
        for _ in range(60)
    })
    tdf = spark.createDataFrame(triples, "s string, p string, o string")
    pdf = pd.DataFrame(triples, columns=["s", "p", "o"])

    def naive(patterns):
        """All variable assignments satisfying every pattern."""
        vars_ = sorted({t[1:] for pat in patterns for t in pat if t.startswith("?")})
        sols = [{}]
        for pat in patterns:
            new = []
            for sol in sols:
                for row in pdf.itertuples(index=False):
                    binding = dict(sol)
                    ok = True
                    for term, val in zip(pat, row):
                        if term.startswith("?"):
                            v = term[1:]
                            if v in binding and binding[v] != val:
                                ok = False
                                break
                            binding[v] = val
                        elif term != val:
                            ok = False
                            break
                    if ok:
                        new.append(binding)
            sols = new
        return {tuple(s[v] for v in vars_) for s in sols}, vars_

    for trial in range(12):
        k = rng.randint(1, 3)
        pats = []
        var_pool = ["?a", "?b", "?c", "?d"]
        for _ in range(k):
            mk = lambda pool: rng.choice(pool)
            pats.append((
                mk(var_pool + nodes[:4]),
                mk(var_pool[:2] + preds),
                mk(var_pool + nodes[:4]),
            ))
        has_var = any(t.startswith("?") for pat in pats for t in pat)
        if not has_var:
            continue
        want, vars_ = naive(pats)
        from kgspark.bgp import bgp_match

        try:
            got_df = bgp_match(tdf, pats, allow_product=True)
        except ValueError:
            continue  # e.g. empty-variable corner the API rejects
        got = {
            tuple(r[v] for v in vars_) for r in got_df.collect()
        } if vars_ else set()
        assert got == want, f"trial {trial}: {pats}"


# ---- round-5: property-path algebra (*, ?, /, ^, alternatives) ----

def test_path_star_constant_subject(ptri):
    # zero-or-more from a chain head: identity plus the closure
    out = bgp_match(ptri, [("n1", "ex:next*", "?b")])
    assert _rows(out.select("b")) == {("n1",), ("n2",), ("n3",), ("n4",)}


def test_path_star_constant_not_in_graph(ptri):
    # SPARQL ZeroLengthPath yields a bound constant even when it does
    # not occur in the graph
    out = bgp_match(ptri, [("nz", "ex:next*", "?b")])
    assert _rows(out.select("b")) == {("nz",)}


def test_path_zero_or_one(ptri):
    out = bgp_match(ptri, [("n1", "ex:next?", "?b")])
    assert _rows(out.select("b")) == {("n1",), ("n2",)}


def test_path_inverse_step(ptri):
    out = bgp_match(ptri, [("?a", "^ex:next", "?b")])
    rows = _rows(out.select("a", "b"))
    assert ("n2", "n1") in rows and ("n1", "n2") not in rows


def test_path_sequence(ptri):
    # two hops along the chain in one pattern
    out = bgp_match(ptri, [("?a", "ex:next/ex:next", "?b")])
    rows = _rows(out.select("a", "b"))
    assert rows >= {("n1", "n3"), ("n2", "n4"), ("c1", "c1"), ("c2", "c2")}
    assert ("n1", "n2") not in rows


def test_path_sequence_with_closure_element(ptri):
    out = bgp_match(ptri, [("n1", "ex:next+/ex:next?", "?b")])
    assert _rows(out.select("b")) == {("n2",), ("n3",), ("n4",)}


def test_path_alternative(ptri):
    out = bgp_match(ptri, [("?a", "(ex:next|ex:other)", "?b")])
    rows = _rows(out.select("a", "b"))
    assert ("x1", "x2") in rows and ("n1", "n2") in rows
    assert len(rows) == 7


def test_path_symmetric_star_includes_all_graph_terms(ptri):
    out = bgp_match(ptri, [("x1", "(ex:next|^ex:next)*", "?b")])
    # x1 has no ex:next edge — only the zero-length path binds
    assert _rows(out.select("b")) == {("x1",)}


def test_path_malformed_raises_value_error(ptri):
    for bad in ("ex:a//ex:b", "(ex:a", "ex:a/", "(|)+"):
        with pytest.raises(ValueError):
            bgp_match(ptri, [("?a", bad, "?b")]).collect()


# ---- round-5: closure-size guard (verdict #3) ----

def test_transitive_closure_guard_trips(spark):
    from kgspark.bgp import transitive_pairs

    edges = spark.createDataFrame(
        [(f"v{i}", f"v{i+1}") for i in range(60)], "s string, o string"
    )
    with pytest.raises(ValueError, match="closure"):
        transitive_pairs(edges, max_pairs=100).count()
    # and succeeds with the bound lifted
    assert transitive_pairs(edges, max_pairs=10_000).count() == 61 * 60 // 2


def test_symmetric_closure_guard_trips(spark):
    from kgspark.bgp import symmetric_closure_pairs

    tri = spark.createDataFrame(
        [(f"v{i}", "owl:sameAs", f"v{i+1}") for i in range(40)],
        "s string, p string, o string",
    )
    with pytest.raises(ValueError, match="degree"):
        symmetric_closure_pairs(tri, "owl:sameAs", max_pairs=100)
    assert (
        symmetric_closure_pairs(tri, "owl:sameAs", max_pairs=10_000).count()
        == 41 * 41
    )


def test_bgp_match_threads_closure_bound(ptri):
    with pytest.raises(ValueError, match="closure|degree"):
        bgp_match(
            ptri, [("?a", "ex:next+", "?b")], max_closure_pairs=2
        ).collect()
