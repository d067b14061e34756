"""Multi-format sources (O2) + envelope unwrapping (O4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgspark import extract, fixtures, sources


def test_json_and_csv_sources_match_parquet(spark, sf_dir, tmp_path):
    docs = sources.read_documents(spark, f"{sf_dir}/documents.parquet")
    jdir, cdir = str(tmp_path / "j"), str(tmp_path / "c")
    docs.write.mode("overwrite").json(jdir)
    docs.write.mode("overwrite").option("header", True).csv(cdir)
    want = {tuple(r) for r in docs.collect()}
    got_j = {tuple(r) for r in sources.read_documents(spark, jdir, "json").collect()}
    got_c = {tuple(r) for r in sources.read_documents(spark, cdir, "csv").collect()}
    assert got_j == want
    # CSV: text column round-trips (no embedded delimiters in fixture)
    assert got_c == want
    # extraction is identical regardless of the wire format
    m_p = extract.mentions_df(fixtures.flat_spans(fixtures.with_spans(docs)))
    m_j = extract.mentions_df(
        fixtures.flat_spans(
            fixtures.with_spans(sources.read_documents(spark, jdir, "json"))
        )
    )
    assert {tuple(r) for r in m_p.collect()} == {tuple(r) for r in m_j.collect()}


def test_envelope_unwrap_and_dispatch(spark):
    rows = [
        ("d1", "en", "s0", 0, "envelope",
         '{"kind": "text", "text": "table key", "media_ref": ""}', "", 0),
        ("d1", "en", "s0", 1, "envelope",
         '{"kind": "media", "text": "", "media_ref": "media://vec/7"}', "", 9),
        ("d1", "en", "s0", 2, "text", "order part", "", 20),
        ("d1", "en", "s0", 3, "envelope", "NOT JSON {", "", 30),
    ]
    flat = spark.createDataFrame(
        rows,
        "doc_id string, lang string, source string, span_pos int, "
        "kind string, text string, media_ref string, offset int",
    )
    un = sources.unwrap_envelopes(flat)
    kinds = {r["span_pos"]: r["kind"] for r in un.collect()}
    assert kinds == {0: "text", 1: "media", 2: "text", 3: "envelope_invalid"}
    # unwrapped text spans flow through the mention kernel
    m = extract.mentions_df(un)
    assert {r["mention_text"] for r in m.collect()} == {"table key", "order part"}
    # invalid envelope lands in quarantine
    q = extract.quarantine_spans(un)
    assert [r["span_pos"] for r in q.collect()] == [3]
