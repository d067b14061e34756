"""Generate/materialize stage (SURVEY.md §3.3; spindle-generate
analogue: ``spindle/generate/{generate,props,classes,index}.c`` `[U~]`).

Inputs: mentions + component labels (norm_text → label) from cc.py.
Outputs:
* ``entities``      — (entity_id, member_iri) membership (D6),
* ``entity_attrs``  — index rows (D7: label via language-preference
  window selection O24/O28, counts, score),
* ``proxy_triples`` — the proxy graph: owl:sameAs membership, rdf:type,
  rdfs:label (Twine writes these into the spindle root graph).

Deterministic id mint (O34): entity_id = sha256(min member IRI)[:32]
— documented deviation from Twine's random UUID proxies so reruns and
parallelism changes are byte-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import exprs as X
from . import grammar as G


def entity_membership(mentions: DataFrame, labels: DataFrame) -> DataFrame:
    """(entity_id, member_iri, root, norm_text) for every distinct
    mention IRI; entity_id minted from the component's min member IRI."""
    iris = (
        mentions.select("norm_text", "mention_iri")
        .distinct()
        .join(labels.withColumnRenamed("node", "norm_text"), "norm_text")
    )
    eids = iris.groupBy("label").agg(F.min("mention_iri").alias("min_member"))
    eids = eids.select(
        "label", X.entity_id_from_min_member(F.col("min_member")).alias("entity_id")
    )
    return iris.join(eids, "label").select(
        "entity_id", F.col("mention_iri").alias("member_iri"), "label", "norm_text"
    )


def entities_df(mentions: DataFrame, labels: DataFrame) -> DataFrame:
    return entity_membership(mentions, labels).select("entity_id", "member_iri")


def entity_attrs_df(mentions: DataFrame, labels: DataFrame) -> DataFrame:
    """D7 index rows.  Label selection = O24/O28: per entity, rank
    candidate (norm_text, lang) pairs by LANG_PREF rank then
    lexicographic norm — ``row_number`` window, deterministic
    tie-breaks."""
    members = entity_membership(mentions, labels)
    m = mentions.join(
        labels.withColumnRenamed("node", "norm_text"), "norm_text"
    ).join(
        members.select("label", "entity_id").distinct(), "label"
    )
    counts = m.groupBy("entity_id").agg(
        F.countDistinct("mention_iri").alias("n_members"),
        F.count("*").alias("n_mentions"),
    )
    cands = m.select("entity_id", "norm_text", "lang").distinct().withColumn(
        "lang_rank", X.lang_rank(F.col("lang"))
    )
    w = Window.partitionBy("entity_id").orderBy("lang_rank", "norm_text")
    best = (
        cands.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "entity_id",
            F.col("norm_text").alias("label"),
            F.col("lang").alias("label_lang"),
        )
    )
    return (
        counts.join(best, "entity_id")
        .select(
            "entity_id",
            "label",
            "label_lang",
            "n_members",
            "n_mentions",
            F.col("n_mentions").alias("score"),
        )
    )


def proxy_triples(mentions: DataFrame, labels: DataFrame) -> DataFrame:
    """Proxy-graph triples (spindle root-graph analogue)."""
    members = entity_membership(mentions, labels)
    t_sameas = members.select(
        F.col("entity_id").alias("s"),
        F.lit(G.P_SAME_AS).alias("p"),
        F.col("member_iri").alias("o"),
    )
    t_type = members.select(F.col("entity_id").alias("s")).distinct().select(
        "s", F.lit(G.P_TYPE).alias("p"), F.lit(G.O_ENTITY_CLASS).alias("o")
    )
    attrs = entity_attrs_df(mentions, labels)
    t_label = attrs.select(
        F.col("entity_id").alias("s"),
        F.lit(G.P_LABEL).alias("p"),
        F.col("label").alias("o"),
    )
    return t_sameas.unionByName(t_type).unionByName(t_label).dropDuplicates(["s", "p", "o"])


def graph_diff(new: DataFrame, old: DataFrame) -> tuple[DataFrame, DataFrame]:
    """O32 old/new graph diff (libtwine/graph.c twine_graph old/new
    models `[U]`): (added, removed) triple sets — drives incremental
    regeneration triggers."""
    return new.exceptAll(old), old.exceptAll(new)
