"""Stage-DAG runner: the twined main loop + workflow chain analogue
(SURVEY.md §3.1; ``libtwine/workflow.c``, ``twined`` daemon `[U~]`),
re-expressed as checkpointed DataFrame stages over the catalog.

    documents ──(bucket by pmod(xxhash64(doc_id), P))──► spans
       spans ──► mentions, media_features, base_triples      [per-bucket]
       mentions ──► edges ──► labels ──► entities/attrs/
                                          proxy+final triples [global]

Per-bucket stages resume idempotently at bucket granularity; global
stages at stage granularity (fingerprint of their input).  Lineage +
counts go to the ``_checkpoint`` table (checkpoint.py).

Deployment: on a real cluster this module is the ``spark-submit``
entry point —

    spark-submit --py-files kgspark.zip -m kgspark.runner \\
        --input s3://…/documents --warehouse s3://…/warehouse

with executors/cores set by the cluster manager; the sandbox runs the
same code on local[N].
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import cc as cc_mod
from . import checkpoint as CP
from . import extract, fixtures, link
from . import generate as gen
from .catalog import ParquetCatalog, with_bucket


def _global_fingerprint(df: DataFrame, cols: list[str]) -> int:
    row = df.select(F.bit_xor(F.xxhash64(*cols)).alias("fp"), F.count("*")).collect()[0]
    return int(row["fp"] or 0)


def _run_global_stage(
    spark: SparkSession,
    cat: ParquetCatalog,
    stage: str,
    input_fp: int,
    compute,
    out_table: str,
) -> DataFrame:
    """Stage-granular resume for non-bucketed (graph-global) stages."""
    cp = CP.read_checkpoints(spark, cat)
    if cp is not None:
        done = (
            CP.latest_state(cp.filter(F.col("stage") == stage))
            .filter(
                (F.col("status") == "complete")
                & (F.col("part_id") == -1)
                & (F.col("input_fingerprint") == input_fp)
            )
            .count()
        )
        if done and cat.exists(out_table):
            return cat.read(spark, out_table)
    out = compute()
    cat.write(out, out_table)
    out = cat.read(spark, out_table)
    n = out.count()
    fps = spark.createDataFrame(
        [(-1, input_fp, n)], "bucket int, input_fingerprint long, row_count long"
    )
    CP.write_checkpoint_rows(cat, stage, fps)
    return out


def run_all(
    spark: SparkSession,
    sf_dir: str,
    warehouse: str,
    n_buckets: int = 32,
    fail_buckets_in: dict[str, set[int]] | None = None,
) -> dict[str, DataFrame]:
    """Run (or resume) the full pipeline, materializing every stage
    output under ``warehouse``.  ``fail_buckets_in`` maps stage name →
    buckets to crash on (test hook)."""
    fail = fail_buckets_in or {}
    cat = ParquetCatalog(warehouse, n_buckets)

    docs = with_bucket(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), n_buckets
    ).repartition(n_buckets, "bucket")

    flat = CP.run_bucketed_stage(
        spark, cat, "spans", docs,
        lambda d: with_bucket(
            fixtures.flat_spans(fixtures.with_spans(d)), n_buckets
        ),
        "spans", fail_buckets=fail.get("spans"),
    )

    mentions = CP.run_bucketed_stage(
        spark, cat, "mentions", flat,
        lambda d: with_bucket(extract.mentions_df(d), n_buckets),
        "mentions", fail_buckets=fail.get("mentions"),
    )

    media = CP.run_bucketed_stage(
        spark, cat, "media_features", flat,
        lambda d: with_bucket(extract.media_features_df(d), n_buckets),
        "media_features", fail_buckets=fail.get("media_features"),
    )

    base_triples = CP.run_bucketed_stage(
        spark, cat, "base_triples", flat,
        lambda d: with_bucket(
            extract.base_triples(
                d, extract.mentions_df(d)
            ).withColumn("doc_id", F.regexp_extract("s", r"^doc://(.*)$", 1)),
            n_buckets, key="doc_id",
        ).drop("doc_id"),
        "base_triples", count_as_triples=True,
        fail_buckets=fail.get("base_triples"),
    )

    # --- global (graph-wide) stages -----------------------------------------
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    m_fp = _global_fingerprint(mentions, ["doc_id", "span_pos", "mention_ord", "mention_iri"])

    edges = _run_global_stage(
        spark, cat, "edges", m_fp,
        lambda: link.scored_edges(mentions, emb), "edges",
    )

    labels = _run_global_stage(
        spark, cat, "labels", m_fp,
        lambda: cc_mod.connected_components(
            edges, mentions.select(F.col("norm_text").alias("node")).distinct()
        ),
        "labels",
    )

    entities = _run_global_stage(
        spark, cat, "entities", m_fp,
        lambda: gen.entities_df(mentions, labels), "entities",
    )
    attrs = _run_global_stage(
        spark, cat, "entity_attrs", m_fp,
        lambda: gen.entity_attrs_df(mentions, labels), "entity_attrs",
    )
    triples = _run_global_stage(
        spark, cat, "triples", m_fp,
        lambda: extract_final_triples(base_triples, mentions, labels), "triples",
    )

    return {
        "spans": flat, "mentions": mentions, "media_features": media,
        "base_triples": base_triples, "edges": edges, "labels": labels,
        "entities": entities, "entity_attrs": attrs, "triples": triples,
    }


def extract_final_triples(base_triples, mentions, labels):
    proxies = gen.proxy_triples(mentions, labels)
    return (
        base_triples.select("s", "p", "o")
        .unionByName(proxies)
        .dropDuplicates(["s", "p", "o"])
    )


def main() -> None:  # pragma: no cover — cluster entry point
    import argparse

    from .session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="dir containing documents.parquet + embeddings.parquet")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--buckets", type=int, default=32)
    args = ap.parse_args()
    spark = get_spark(app_name="kgspark-runner")
    out = run_all(spark, args.input, args.warehouse, n_buckets=args.buckets)
    print({k: v.count() for k, v in out.items()})


if __name__ == "__main__":  # pragma: no cover
    main()
