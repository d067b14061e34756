"""O24 full D7 form: property-rulebase selection semantics on a
synthetic coref graph — priority fallback, language preference within a
priority tier, and deterministic tie-breaks."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgspark import generate as gen
from kgspark import grammar as G


def _mentions(spark, rows):
    # (norm_text, mention_iri, lang, source) — the columns entity_props
    # consumes (plus labels keyed by norm_text)
    return spark.createDataFrame(
        rows, "norm_text string, mention_iri string, lang string, source string"
    )


def _labels(spark, pairs):
    return spark.createDataFrame(pairs, "node string, label string")


def _props(df):
    return {
        (r["entity_id"], r["pred"]): (r["value"], r["value_lang"])
        for r in df.collect()
    }


def test_priority_fallback_and_lang_pref(spark):
    """Entity A has a multi-token mention → ex:title comes from the
    priority-1 norm_multi rule; entity B has only single-token mentions
    → the priority-2 norm_any fallback fires.  Within a priority tier,
    LANG_PREF ranks the candidates (en beats de beats zh)."""
    m = _mentions(
        spark,
        [
            # entity A: one multi-token mention (de) + single-token (en)
            ("data table", "ex://s1/data_table", "de", "s1"),
            ("data", "ex://s1/data", "en", "s1"),
            # entity B: single-token mentions only, zh + en
            ("query", "ex://s2/query", "zh", "s2"),
            ("query", "ex://s3/query", "en", "s3"),
        ],
    )
    labels = _labels(
        spark,
        [("data table", "A"), ("data", "A"), ("query", "B")],
    )
    out = gen.entity_props(m, labels)
    # resolve the minted ids via membership
    memb = gen.entity_membership(m, labels)
    eid = {
        r["label"]: r["entity_id"]
        for r in memb.select("label", "entity_id").distinct().collect()
    }
    p = _props(out)
    # A: multi-token candidate wins ex:title despite worse lang rank
    assert p[(eid["A"], "ex:title")] == ("data table", "de")
    # B: fallback norm_any; en beats zh by LANG_PREF
    assert p[(eid["B"], "ex:title")] == ("query", "en")
    # subject = head token, no lang tag
    assert p[(eid["A"], "ex:subject")] == ("data", "")
    assert p[(eid["B"], "ex:subject")] == ("query", "")
    # origin = min source (value asc tie-break), no lang tag
    assert p[(eid["B"], "ex:origin")] == ("s2", "")
    # dc:language = LANG_PREF-best member language
    assert p[(eid["A"], "dc:language")] == ("en", "en")  # en outranks de
    assert p[(eid["B"], "dc:language")] == ("en", "en")
    # every entity gets every target predicate exactly once
    preds = {pr for _, pr in p}
    assert preds == {pr for pr, *_ in G.PROPERTY_RULES}
    assert len(p) == len(eid) * len(preds)


def test_props_deterministic_across_parallelism(spark):
    rows = [
        (f"value vector", f"ex://s{i%3}/value_vector", l, f"s{i%3}")
        for i, l in enumerate(["en", "de", "fr", "zh", "es"] * 4)
    ]
    m = _mentions(spark, rows)
    labels = _labels(spark, [("value vector", "R")])
    a = sorted(map(tuple, gen.entity_props(m.repartition(1), labels).collect()))
    b = sorted(map(tuple, gen.entity_props(m.repartition(16), labels).collect()))
    assert a == b


def test_proxy_triples_single_dedup_equals_full_projection(spark):
    """r7: proxy_triples dedups ONCE at (s,p,o) on the raw branch
    union; the result set must equal the old shape (full 6-column
    dedup, then project, then re-dedup) and carry no duplicates."""
    rows = [
        ("value vector", f"ex://s{i%3}/value_vector#{i}", l, f"s{i%3}")
        for i, l in enumerate(["en", "de", "fr", "zh", "es"] * 4)
    ] + [
        ("alpha unit", f"ex://s{i%2}/alpha_unit#{i}", "en", f"s{i%2}")
        for i in range(4)
    ]
    m = _mentions(spark, rows)
    labels = _labels(spark, [("value vector", "R"), ("alpha unit", "A")])
    new = [tuple(r) for r in gen.proxy_triples(m, labels).collect()]
    old = [
        tuple(r)
        for r in gen.proxy_triples_full(m, labels)
        .select("s", "p", "o")
        .dropDuplicates(["s", "p", "o"])
        .collect()
    ]
    assert sorted(new) == sorted(old)
    assert len(new) == len(set(new))
