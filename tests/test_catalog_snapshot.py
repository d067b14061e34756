"""SnapshotCatalog (round 6): snapshot isolation + time travel for the
catalog seam — a reader pinned to manifest N never observes a torn
table while writers replace partitions, and manifest N stays readable
after later commits."""

from __future__ import annotations

import pytest

from kgspark.catalog import SnapshotCatalog


def _rows(df):
    return {tuple(r) for r in df.select("g", "s", "o").collect()}


def _quads(spark, rows):
    return spark.createDataFrame(rows, "g string, s string, o string")


def test_snapshot_pinned_reader_and_time_travel(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path))
    v1 = cat.commit_replace(
        _quads(spark, [("ex:g1", "a", "1"), ("ex:g1", "b", "1"),
                       ("ex:g2", "c", "1")]),
        "t", partition_col="g",
    )
    assert v1 == 1
    pinned = cat.read_at(spark, "t", version=1)
    base = _rows(pinned)
    assert base == {("ex:g1", "a", "1"), ("ex:g1", "b", "1"),
                    ("ex:g2", "c", "1")}

    # two later commits replace one partition each
    assert cat.commit_replace(
        _quads(spark, [("ex:g1", "a", "2")]), "t", partition_col="g") == 2
    assert cat.commit_replace(
        _quads(spark, [("ex:g2", "c", "3"), ("ex:g2", "d", "3")]),
        "t", partition_col="g") == 3

    # the PINNED frame re-evaluates to exactly the v1 content — its
    # files were never touched by the later commits
    assert _rows(pinned) == base
    # latest = v2's g1 + v3's g2
    assert _rows(cat.read_at(spark, "t")) == {
        ("ex:g1", "a", "2"), ("ex:g2", "c", "3"), ("ex:g2", "d", "3")
    }
    # time travel: every historical version remains exactly readable
    assert _rows(cat.read_at(spark, "t", version=1)) == base
    assert _rows(cat.read_at(spark, "t", version=2)) == {
        ("ex:g1", "a", "2"), ("ex:g2", "c", "1")
    }
    with pytest.raises(ValueError, match="unknown version"):
        cat.read_at(spark, "t", version=9)
    with pytest.raises(ValueError, match="partition_col"):
        cat.commit_replace(
            _quads(spark, [("x", "y", "z")]), "t", partition_col="s")


def test_snapshot_reader_never_sees_torn_table(spark, tmp_path):
    """Writers continuously replace both partitions with 3-row payloads
    sharing a per-commit token; every latest-manifest read must observe,
    per partition, one complete payload (3 rows, a single token) —
    never a mix of two commits or a partially-visible write."""
    import threading

    cat = SnapshotCatalog(str(tmp_path))
    cat.commit_replace(
        _quads(spark, [("g1", f"s{k}", "seed") for k in range(3)]
               + [("g2", f"s{k}", "seed") for k in range(3)]),
        "t", partition_col="g",
    )
    stop = threading.Event()
    errs: list[Exception] = []

    def writer():
        try:
            for i in range(6):
                tok = f"w{i}"
                cat.commit_replace(
                    _quads(spark, [("g1", f"s{k}", tok) for k in range(3)]
                           + [("g2", f"s{k}", tok) for k in range(3)]),
                    "t", partition_col="g",
                )
        except Exception as e:  # pragma: no cover
            errs.append(e)
        finally:
            stop.set()

    t = threading.Thread(target=writer)
    t.start()
    checked = 0
    while not stop.is_set() or checked == 0:
        rows = cat.read_at(spark, "t").collect()
        by_g: dict[str, list] = {}
        for r in rows:
            by_g.setdefault(r["g"], []).append((r["s"], r["o"]))
        assert set(by_g) == {"g1", "g2"}
        for g, rs in by_g.items():
            toks = {o for _, o in rs}
            assert len(toks) == 1, f"torn partition {g}: {toks}"
            assert sorted(s for s, _ in rs) == ["s0", "s1", "s2"], (g, rs)
        checked += 1
    t.join()
    assert not errs
    assert checked >= 1
    # history is complete and monotone: versions 1..N all readable
    vs = cat.versions("t")
    assert vs == list(range(1, len(vs) + 1))


def test_snapshot_diff_change_set(spark, tmp_path):
    """Diff of v1 → v3: g1's 'a' value changed (one '-' one '+'),
    g2 gained a row and changed one — bag semantics via exceptAll."""
    from kgspark.catalog import snapshot_diff

    cat = SnapshotCatalog(str(tmp_path))
    cat.commit_replace(
        _quads(spark, [("ex:g1", "a", "1"), ("ex:g1", "b", "1"),
                       ("ex:g2", "c", "1")]),
        "t", partition_col="g",
    )
    cat.commit_replace(
        _quads(spark, [("ex:g1", "a", "2"), ("ex:g1", "b", "1")]),
        "t", partition_col="g")
    cat.commit_replace(
        _quads(spark, [("ex:g2", "c", "3"), ("ex:g2", "d", "3")]),
        "t", partition_col="g")

    diff = {
        tuple(r) for r in
        snapshot_diff(spark, cat, "t", 1, 3)
        .select("g", "s", "o", "change").collect()
    }
    assert diff == {
        ("ex:g1", "a", "2", "+"), ("ex:g1", "a", "1", "-"),
        ("ex:g2", "c", "3", "+"), ("ex:g2", "d", "3", "+"),
        ("ex:g2", "c", "1", "-"),
    }
    # identical versions diff empty
    assert snapshot_diff(spark, cat, "t", 3, 3).count() == 0


def test_expire_snapshots_keeps_pinned_horizon(spark, tmp_path):
    """3 commits → expire keep_last=2: v1 time travel is gone, v2/v3
    read EXACTLY what they read before expiry (pinned readers inside
    the horizon unaffected), and the unreferenced v1 commit directory
    is physically removed."""
    import os

    from kgspark.catalog import SnapshotCatalog, expire_snapshots

    cat = SnapshotCatalog(str(tmp_path / "wh"), 4)
    def df(vals):
        return spark.createDataFrame(
            [(i, v, i % 2) for i, v in enumerate(vals)],
            "id int, val string, bucket int",
        )
    cat.commit_replace(df(["a", "b"]), "t")            # v1
    cat.commit_replace(df(["c", "d"]), "t")            # v2 replaces both parts
    cat.commit_replace(df(["e", "f"]), "t")            # v3
    before2 = {tuple(r) for r in cat.read_at(spark, "t", 2).collect()}
    before3 = {tuple(r) for r in cat.read_at(spark, "t", 3).collect()}

    out = expire_snapshots(cat, "t", keep_last=2)
    assert out["kept_versions"] == [2, 3]
    assert out["removed_versions"] == [1]
    assert "v1" in out["removed_dirs"]
    assert not os.path.isdir(os.path.join(cat._ddir("t"), "v1"))

    assert {tuple(r) for r in cat.read_at(spark, "t", 2).collect()} == before2
    assert {tuple(r) for r in cat.read_at(spark, "t", 3).collect()} == before3
    import pytest as _pt

    with _pt.raises(ValueError):
        cat.read_at(spark, "t", 1)
    # expiry is idempotent
    out2 = expire_snapshots(cat, "t", keep_last=2)
    assert out2["removed_versions"] == [] and out2["removed_dirs"] == []


def test_multi_table_txn_atomic_and_pinned(spark, tmp_path):
    """Cross-table transaction: read_txn sees a mutually-consistent
    pair of tables; older txns stay pinned under later commits; a
    stray OUT-of-txn commit_replace never leaks into txn readers;
    a partial txn (one table) carries the other forward."""
    from kgspark.catalog import SnapshotCatalog, with_bucket

    cat = SnapshotCatalog(str(tmp_path / "cat"), n_buckets=4)

    def frame(vals):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "doc_id long, val string"
        )
        return with_bucket(df, 4)

    t1 = cat.commit_txn({"ents": frame(["a", "b"]), "attrs": frame(["x"])})
    assert t1 == 1
    snap1 = cat.read_txn(spark)
    assert sorted(r["val"] for r in snap1["ents"].collect()) == ["a", "b"]
    assert [r["val"] for r in snap1["attrs"].collect()] == ["x"]

    t2 = cat.commit_txn(
        {"ents": frame(["a2", "b2"]), "attrs": frame(["x2"])}
    )
    assert t2 == 2
    # txn 1 pinned: still the old consistent pair
    old = cat.read_txn(spark, 1)
    assert sorted(r["val"] for r in old["ents"].collect()) == ["a", "b"]
    assert [r["val"] for r in old["attrs"].collect()] == ["x"]

    # stray out-of-txn commit on ents does NOT leak into txn readers
    cat.commit_replace(frame(["rogue"]), "ents")
    latest = cat.read_txn(spark)
    assert sorted(r["val"] for r in latest["ents"].collect()) == ["a2", "b2"]

    # partial txn: replace attrs only; ents carried at its txn-2 pin
    t3 = cat.commit_txn({"attrs": frame(["x3"])})
    snap3 = cat.read_txn(spark, t3)
    assert [r["val"] for r in snap3["attrs"].collect()] == ["x3"]
    assert sorted(r["val"] for r in snap3["ents"].collect()) == ["a2", "b2"]


def test_expire_respects_txn_pins(spark, tmp_path):
    """expire_snapshots must keep table versions pinned by surviving
    txn manifests (read_txn on an old txn stays byte-identical);
    expire_txns releases the pins so a second expiry reclaims them."""
    from kgspark.catalog import (
        SnapshotCatalog,
        expire_snapshots,
        expire_txns,
        with_bucket,
    )

    cat = SnapshotCatalog(str(tmp_path / "cat"), n_buckets=4)

    def frame(vals):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "doc_id long, val string"
        )
        return with_bucket(df, 4)

    cat.commit_txn({"t": frame(["v1"])})          # t@1 pinned by txn 1
    cat.commit_txn({"t": frame(["v2"])})          # t@2 pinned by txn 2
    cat.commit_replace(frame(["v3"]), "t")        # t@3 unpinned
    cat.commit_replace(frame(["v4"]), "t")        # t@4 unpinned latest

    res = expire_snapshots(cat, "t", keep_last=1)
    # naive horizon would keep only v4; txn pins keep v1 and v2 alive
    assert res["kept_versions"] == [1, 2, 4]
    assert res["removed_versions"] == [3]
    assert [r["val"] for r in cat.read_txn(spark, 1)["t"].collect()] == ["v1"]
    assert [r["val"] for r in cat.read_txn(spark, 2)["t"].collect()] == ["v2"]

    # releasing txn 1's pin lets the next expiry reclaim t@1
    assert expire_txns(cat, keep_last=1)["removed_txns"] == [1]
    res2 = expire_snapshots(cat, "t", keep_last=1)
    assert 1 in res2["removed_versions"]
    assert [r["val"] for r in cat.read_txn(spark, 2)["t"].collect()] == ["v2"]
