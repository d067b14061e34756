"""Dedup operators on planted duplicates (the fixture corpus has no
natural near-dups — max trigram Jaccard ≈ 0.02 — so the decision
thresholds are exercised on injected ones)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgspark import dedup as D
from kgspark import grammar as G


@pytest.fixture(scope="module")
def planted(spark, sf_dir):
    """Fixture docs + exact copies (doc_id+10000) and near-copies with
    the last 2 tokens altered (doc_id+20000) for the first 5 docs."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.filter(F.col("doc_id") < 5)
    exact = base.withColumn("doc_id", F.col("doc_id") + 10000)
    near = base.withColumn("doc_id", F.col("doc_id") + 20000).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zz yy"))
    )
    return docs.unionByName(exact).unionByName(near)


def test_exact_dup_groups_full_text(spark, planted):
    groups = D.exact_dup_groups(planted, prefix_tokens=None).collect()
    # 5 exact-copy groups (near-copies differ in full text)
    assert len(groups) == 5
    assert all(r["n_docs"] == 2 for r in groups)
    assert all(r["keep_doc_id"] < 5 for r in groups)


def test_minhash_finds_planted_neardups(spark, planted):
    pairs = D.minhash_lsh_pairs(planted, jaccard_min=G.DEDUP_JACCARD_TAU).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    for i in range(5):
        assert (i, i + 10000) in found, f"exact copy of {i} missed"
        assert (i, i + 20000) in found, f"near copy of {i} missed"
        assert (i + 10000, i + 20000) in found
    # exact copies score J=1
    j = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs}
    assert all(j[(i, i + 10000)] == 1.0 for i in range(5))


def test_simhash_planted(spark, planted):
    # short fixture docs (~20-60 shingles) have thin vote margins, so a
    # 2-token edit flips up to ~6 of 62 bits — use hamming_max=8 here
    # (HAMMING_TAU=3 is tuned for long documents)
    pairs = D.simhash_pairs(planted, hamming_max=8).collect()
    found = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs}
    for i in range(5):
        assert found.get((i, i + 10000)) == 0, "exact copy must have hamming 0"
        assert (i, i + 20000) in found, "near copy within hamming 8"


def test_ngram_jaccard_planted(spark, planted):
    pairs = D.ngram_jaccard_pairs(planted, jaccard_min=0.5).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert all((i, i + 10000) in found for i in range(5))


def test_minhash_banding_shape(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    b = D.minhash_bands(docs)
    assert b.count() == 10 * G.LSH_BANDS
    assert b.groupBy("doc_id").count().filter(
        F.col("count") != G.LSH_BANDS
    ).count() == 0


def test_dedup_clusters_planted(spark, planted):
    """Decision step at the production threshold: each planted trio
    (original, exact copy, near copy) collapses to one cluster keyed by
    the min doc_id; untouched docs appear in no cluster."""
    out = {r["doc_id"]: r["keep_doc_id"]
           for r in D.dedup_clusters(planted).collect()}
    for i in range(5):
        assert out.get(i) == i
        assert out.get(i + 10000) == i, "exact copy keeps the original"
        assert out.get(i + 20000) == i, "near copy keeps the original"
    # a doc with no near-dup must not appear
    assert 7 not in out


def test_setsim_pairs_hot_key_exact(spark):
    """Hot-key correctness: 60 sets sharing one scorching code (every
    pair qualifies through it) — the salted slim count join must still
    produce the exact brute-force pair set and Jaccard values."""
    import itertools

    rows = []
    for i in range(60):
        # shared hot code 999; two semi-shared codes; one unique code
        rows.append((i, [999, 100 + (i % 3), 200 + (i % 5), 1000 + i]))
    df = spark.createDataFrame(rows, "id long, codes array<bigint>")
    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in D.setsim_pairs(df, "id", "codes", 0.2).collect()
    }
    sets = {i: set(c) for i, c in rows}
    want = {}
    for a, b in itertools.combinations(range(60), 2):
        j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        if j >= 0.2:
            want[(a, b)] = round(j, 9)
    assert got == want and len(want) > 100


@pytest.mark.parametrize("seed", [7, 23, 101])
def test_setsim_pairs_matches_bruteforce_random(spark, seed):
    """Randomized cross-check: the slim count join equals brute-force
    Jaccard enumeration on arbitrary set families (varied sizes,
    duplicates included)."""
    import itertools
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(80):
        n = rng.randint(1, 30)
        rows.append((i, sorted(rng.sample(range(200), n))))
    # inject exact duplicates (identical-set grouping path)
    rows.append((900, list(rows[0][1])))
    rows.append((901, list(rows[0][1])))
    tau = 0.3
    df = spark.createDataFrame(rows, "id long, codes array<bigint>")
    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in D.setsim_pairs(df, "id", "codes", tau).collect()
    }
    sets = {i: set(c) for i, c in rows}
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        if j >= tau:
            want[(a, b)] = round(j, 9)
    assert got == want


@pytest.mark.parametrize("seed", [3, 77])
def test_simhash_pigeonhole_matches_bruteforce_random(spark, seed):
    """The pigeonhole segment join equals brute-force hamming
    enumeration over random fingerprints, for several radii."""
    import itertools
    import random

    rng = random.Random(seed)
    # fingerprints clustered so some pairs fall inside the radius
    base = [rng.getrandbits(G.SIMHASH_BITS) for _ in range(12)]
    fps = []
    for i, b in enumerate(base):
        fps.append((i * 10, b))
        flipped = b
        for _ in range(rng.randint(0, 5)):
            flipped ^= 1 << rng.randrange(G.SIMHASH_BITS)
        fps.append((i * 10 + 1, flipped))
    docs = spark.createDataFrame(fps, "doc_id long, simhash long")
    for hmax in (2, 4, 8):
        segs = D._simhash_segments(hmax)
        from pyspark.sql import functions as F

        # drive simhash_pairs' join logic directly on the fingerprints
        import kgspark.dedup as dd

        s = docs
        seg_arr = F.array(*[
            F.struct(F.lit(j).alias("seg_id"),
                     F.shiftright("simhash", off).bitwiseAND(F.lit(mask)).alias("seg_bits"))
            for j, off, mask in segs])
        inv = s.select("doc_id", "simhash", F.explode(seg_arr).alias("g")).select(
            "doc_id", "simhash", F.col("g.seg_id"), F.col("g.seg_bits"))
        a, b = inv.alias("a"), inv.alias("b")
        ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
        first_eq = F.coalesce(*[
            F.when(F.shiftright(F.col("a.simhash"), off).bitwiseAND(F.lit(mask))
                   == F.shiftright(F.col("b.simhash"), off).bitwiseAND(F.lit(mask)), F.lit(j))
            for j, off, mask in segs])
        got = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in a.join(b, (F.col("a.seg_id") == F.col("b.seg_id"))
                            & (F.col("a.seg_bits") == F.col("b.seg_bits"))
                            & (F.col("a.doc_id") < F.col("b.doc_id")))
            .filter(ham <= hmax).filter(F.col("a.seg_id") == first_eq)
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"), ham.alias("hamming"))
            .collect()
        }
        want = {
            (min(ia, ib), max(ia, ib), bin(fa ^ fb).count("1"))
            for (ia, fa), (ib, fb) in itertools.combinations(fps, 2)
            if bin(fa ^ fb).count("1") <= hmax
        }
        assert got == want, f"hmax={hmax}" 


def test_contamination_flags_detects_injected_leak(spark):
    """A train document copying an eval document's text must flag; an
    unrelated train document must not."""
    from kgspark import dedup as D

    eval_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    rows = [
        (0, eval_text, "en", "src1"),            # eval (0 % 97 == 0)
        (1, eval_text + "tail token", "en", "src1"),  # contaminated train doc
        (2, "completely different words entirely unrelated content here "
            "more unrelated tokens again and again", "en", "src1"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = {r["doc_id"]: (r["n_shared"], r["flagged"])
           for r in D.contamination_flags(docs).collect()}
    assert set(out) == {1, 2}          # eval doc excluded from output
    assert out[1][1] is True and out[1][0] >= 8
    assert out[2][1] is False


def test_para_dedup_detects_planted_boilerplate(spark):
    """Two documents sharing one identical 12-token paragraph (distinct
    elsewhere) must surface exactly that cross-document paragraph pair
    with Jaccard 1.0; a third unrelated doc must not pair."""
    from kgspark import dedup as D
    from kgspark import grammar as G

    boiler = " ".join(f"boil{i}" for i in range(G.PARA_TOKENS))
    uniq = lambda tag: " ".join(f"{tag}{i}" for i in range(G.PARA_TOKENS))
    rows = [
        (1, boiler + " " + uniq("aa"), "en", "s1"),
        (2, uniq("bb") + " " + boiler, "en", "s1"),
        (3, uniq("cc") + " " + uniq("dd"), "en", "s2"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    paras = D.paragraphs(docs)
    assert paras.count() == 6  # 2 paragraphs per doc
    pairs = D.para_minhash_pairs(docs, jaccard_min=0.9).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p["doc_a"], p["para_a"], p["doc_b"], p["para_b"]) == (1, 0, 2, 1)
    assert p["jaccard"] == 1.0


def test_containment_short_inside_long(spark):
    """A 5-token doc whose text is a verbatim prefix of a 40-token doc:
    every shingle of the short doc appears in the long one → C = 1e6,
    while Jaccard is far below any useful threshold (the case the
    symmetric metric misses)."""
    from kgspark.dedup import containment_pairs, with_shingles

    short = "alpha beta gamma delta epsilon"
    long_ = short + " " + " ".join(f"tok{i}" for i in range(35))
    docs = spark.createDataFrame(
        [(1, short, "en", "s"), (2, long_, "en", "s"),
         (3, "zeta eta theta iota kappa", "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    out = {
        (r["id_a"], r["id_b"]): r["cont_e6"]
        for r in containment_pairs(
            with_shingles(docs, repartition=False), "doc_id", "shingles"
        ).collect()
    }
    assert out.get((1, 2)) == 1_000_000
    assert (1, 3) not in out and (2, 3) not in out


def test_containment_identical_sets_and_threshold(spark):
    from kgspark.dedup import containment_pairs, with_shingles

    t = "one two three four five six"
    docs = spark.createDataFrame(
        [(1, t, "en", "s"), (2, t, "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    out = containment_pairs(
        with_shingles(docs, repartition=False), "doc_id", "shingles"
    ).collect()
    assert [(r["id_a"], r["id_b"], r["cont_e6"]) for r in out] == [
        (1, 2, 1_000_000)
    ]


def test_containment_plan_no_cartesian(spark, sf_dir):
    from kgspark.dedup import containment_pairs, with_shingles

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = containment_pairs(with_shingles(docs), "doc_id", "shingles")
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Union" in p  # hybrid hot/cold paths union before the count


def test_keep_best_prefers_quality_over_min_id(spark, tmp_path):
    """Planted near-dup pair where the HIGHER doc_id has the better
    quality (longer, more distinct tokens): min-id clustering would
    keep doc 1; the quality-aware keeper keeps doc 2."""
    import pandas as pd

    base = " ".join(f"tok{i}" for i in range(30))
    rich = base + " " + " ".join(f"extra{i}" for i in range(25))
    pd.DataFrame({
        "doc_id": [1, 2, 9],
        "text": [base, rich, "unrelated totally different words here"],
        "lang": ["en"] * 3, "source": ["s"] * 3,
        "n_chars": [len(base), len(rich), 37],
    }).to_parquet(f"{tmp_path}/documents.parquet")
    import kgspark.queries as QQ

    out = {r["doc_id"]: r["keep_doc_id"] for r in
           QQ.dedup_keep_best(spark, str(tmp_path)).collect()}
    assert out.get(1) == 2 and out.get(2) == 2
    assert 9 not in out  # not near-dup of anything


def test_minhash_calibration_identical_pair_zero_error(spark, sf_dir):
    """A cloned document pair: signature estimate = exact Jaccard =
    1e6, abs error 0 — and every estimate stays on [0, 1e6]."""
    import pandas as pd

    from kgspark import dedup as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    clone = docs.filter("doc_id = 7").toPandas()
    clone["doc_id"] = 70007
    planted = spark.createDataFrame(
        pd.concat([docs.toPandas(), clone], ignore_index=True)
    )
    rows = D.minhash_calibration(planted).collect()
    got = {(r["doc_a"], r["doc_b"]): r for r in rows}
    r = got[(7, 70007)]
    assert (r["est_jaccard_e6"], r["exact_jaccard_e6"], r["abs_err_e6"]) == (
        1000000, 1000000, 0,
    )
    assert all(0 <= x["est_jaccard_e6"] <= 1000000 for x in rows)
    assert all(
        x["abs_err_e6"] == abs(x["est_jaccard_e6"] - x["exact_jaccard_e6"])
        for x in rows
    )


def test_winnow_verbatim_copy_guaranteed(spark, sf_dir):
    """Winnowing's recall bound: a full verbatim copy of a document
    shares ALL its fingerprints with the original — the planted clone
    pair must surface, and n_shared must equal the per-doc fingerprint
    count.  Also checks the density claim: the winnowed set is a
    strict (and much smaller) subset of the distinct shingle set."""
    import pandas as pd

    from kgspark import dedup as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    clone = docs.filter("doc_id = 7").toPandas()
    clone["doc_id"] = 70007
    planted = spark.createDataFrame(
        pd.concat([docs.toPandas(), clone], ignore_index=True)
    )
    fps = D.winnow_fingerprints(planted)
    n7 = fps.filter("doc_id = 7").count()
    assert n7 > 0
    shingles7 = (
        D.with_shingles(docs.filter("doc_id = 7"))
        .selectExpr("explode(shingles)")
        .distinct()
        .count()
    )
    assert n7 < shingles7  # selection actually thins the mass

    dfc = fps.groupBy("code").count().filter("count >= 2 and count <= 64")
    a, b = fps.alias("a"), fps.alias("b")
    from pyspark.sql import functions as F

    pairs = (
        a.join(dfc.select("code"), "code")
        .join(b, (F.col("a.code") == F.col("b.code"))
              & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .count()
    )
    hit = pairs.filter("doc_a = 7 and doc_b = 70007").collect()
    assert len(hit) == 1 and hit[0]["count"] == n7
