"""Pure-pandas reference oracle for the KG pipeline (FIXTURES.md §C).

A deliberately naive, obviously-correct implementation of the exact
extraction / link / canonicalize rules, standing in for "Twine reference
output" (the C reference checkout was empty at survey time — SURVEY.md
§0).  The Spark pipeline must achieve P/R ≥ 0.95 on (s,p,o) triples vs
this oracle and exact span-sequence equality per document
(BASELINE.json:2,14,15).

Deliberately independent implementation style: plain Python loops over
pandas rows — slow, simple, auditable.  Never import kgspark Spark code
here (grammar constants only, which both sides share as *the spec*).
"""

from __future__ import annotations

import hashlib
import re
import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from kgspark import grammar as G  # noqa: E402

MENTION_RE = re.compile(G.MENTION_PATTERN)


# --- spans -------------------------------------------------------------------
def spans_for_doc(doc_id: int, text: str) -> list[dict]:
    toks = text.split(" ")
    n_chunks = -(-len(toks) // G.CHUNK_TOKENS)
    mref = f"media://vec/{doc_id % G.MEDIA_MOD}"
    out = []
    for k in range(n_chunks):
        chunk = " ".join(toks[k * G.CHUNK_TOKENS : (k + 1) * G.CHUNK_TOKENS])
        off = 0 if k == 0 else len(" ".join(toks[: k * G.CHUNK_TOKENS])) + 1
        out.append({"kind": "text", "text": chunk, "media_ref": "", "offset": off})
        if (k + 1) % G.MEDIA_EVERY == 0:
            out.append(
                {
                    "kind": "media",
                    "text": "",
                    "media_ref": mref,
                    "offset": off + len(chunk),
                }
            )
    return out


def oracle_spans(documents: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for r in documents.itertuples():
        for pos, s in enumerate(spans_for_doc(int(r.doc_id), r.text)):
            rows.append(
                {
                    "doc_id": str(r.doc_id),
                    "lang": r.lang,
                    "source": r.source,
                    "span_pos": pos,
                    **s,
                }
            )
    return pd.DataFrame(rows)


# --- mentions ----------------------------------------------------------------
def norm_text(t: str) -> str:
    return re.sub(r" +", " ", t.strip().lower())


def mention_iri(source: str, norm: str) -> str:
    return f"{G.MENTION_IRI_PREFIX}{source}/{norm.replace(' ', '_')}"


def oracle_mentions(spans: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for r in spans.itertuples():
        if r.kind != "text":
            continue
        for ord_, m in enumerate(MENTION_RE.findall(" " + r.text + " ")):
            norm = norm_text(m)
            rows.append(
                {
                    "doc_id": r.doc_id,
                    "lang": r.lang,
                    "source": r.source,
                    "span_pos": r.span_pos,
                    "mention_ord": ord_,
                    "mention_text": m,
                    "norm_text": norm,
                    "mention_iri": mention_iri(r.source, norm),
                }
            )
    return pd.DataFrame(rows)


# --- linking -----------------------------------------------------------------
def jaccard(a: set, b: set) -> float:
    return len(a & b) / len(a | b)


def fingerprint(tokens: list[str]) -> int:
    acc = 0
    for t in tokens:
        acc = (acc * 31 + G.tokcode_py(t)) % G.FP_MOD
    return acc


def vec_id(norm: str, n_embeddings: int) -> int:
    return fingerprint(norm.split(" ")) % n_embeddings


def cosine(a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    return float(np.dot(a, b) / (np.sqrt(np.dot(a, a)) * np.sqrt(np.dot(b, b))))


def oracle_norm_edges(mentions: pd.DataFrame, embeddings: pd.DataFrame) -> pd.DataFrame:
    """Accepted sameAs edges between DISTINCT norm_texts: all pairs
    sharing ≥1 token (the exact blocking-superset of any LSH scheme),
    accepted iff  J >= JACCARD_TAU
              or (J >= COSINE_JACCARD_MIN and cosine >= COSINE_TAU)."""
    norms = sorted(mentions["norm_text"].unique())
    toksets = {n: set(n.split(" ")) for n in norms}
    emb = {int(r.vec_id): np.array(r.embedding) for r in embeddings.itertuples()}
    n_emb = len(embeddings)
    rows = []
    for i, a in enumerate(norms):
        for b in norms[i + 1 :]:
            ta, tb = toksets[a], toksets[b]
            if not ta & tb:
                continue
            j = jaccard(ta, tb)
            va, vb = vec_id(a, n_emb), vec_id(b, n_emb)
            c = 1.0 if va == vb else cosine(emb[va], emb[vb])
            if j >= G.JACCARD_TAU or (j >= G.COSINE_JACCARD_MIN and c >= G.COSINE_TAU):
                rows.append({"norm_a": a, "norm_b": b, "jaccard": j, "cosine": c})
    return pd.DataFrame(rows, columns=["norm_a", "norm_b", "jaccard", "cosine"])


def oracle_components(norms: list[str], edges: pd.DataFrame) -> dict[str, str]:
    """Union-find over norm_texts → {norm: component_root_norm}."""
    parent = {n: n for n in norms}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in edges.itertuples():
        ra, rb = find(r.norm_a), find(r.norm_b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {n: find(n) for n in norms}


def entity_id(min_member_iri: str) -> str:
    h = hashlib.sha256(min_member_iri.encode()).hexdigest()[:32]
    return f"{G.ENTITY_IRI_PREFIX}{h}{G.ENTITY_IRI_SUFFIX}"


def oracle_entities(mentions: pd.DataFrame, comp: dict[str, str]) -> pd.DataFrame:
    """entity membership: every mention IRI of every norm in a component."""
    iris = mentions[["norm_text", "mention_iri"]].drop_duplicates()
    iris = iris.assign(root=iris["norm_text"].map(comp))
    groups = iris.groupby("root")["mention_iri"].apply(lambda s: sorted(set(s)))
    rows = []
    for _, members in groups.items():
        eid = entity_id(members[0])
        for m in members:
            rows.append({"entity_id": eid, "member_iri": m})
    return pd.DataFrame(rows, columns=["entity_id", "member_iri"])


def oracle_labels(mentions: pd.DataFrame, comp: dict[str, str]) -> pd.DataFrame:
    """Best label per entity: candidates = (norm_text, doc lang) of member
    mentions; rank by LANG_PREF then lexicographic norm (O24/O28)."""
    iris = mentions[["norm_text", "mention_iri"]].drop_duplicates()
    iris = iris.assign(root=iris["norm_text"].map(comp))
    root_eid = {}
    groups = iris.groupby("root")["mention_iri"].apply(lambda s: sorted(set(s)))
    for root, members in groups.items():
        root_eid[root] = entity_id(members[0])
    m = mentions.assign(root=mentions["norm_text"].map(comp))
    lang_rank = {l: i for i, l in enumerate(G.LANG_PREF)}
    rows = []
    for root, grp in m.groupby("root"):
        cands = sorted(
            {(lang_rank.get(r.lang, len(G.LANG_PREF) + 1), r.norm_text, r.lang)
             for r in grp.itertuples()}
        )
        rk, norm, lang = cands[0]
        rows.append(
            {
                "entity_id": root_eid[root],
                "label": norm,
                "label_lang": lang,
                "n_members": int(grp["mention_iri"].nunique()),
                "n_mentions": int(len(grp)),
            }
        )
    return pd.DataFrame(rows).sort_values("entity_id").reset_index(drop=True)


# --- triples -----------------------------------------------------------------
def oracle_triples(
    documents: pd.DataFrame, embeddings: pd.DataFrame
) -> tuple[pd.DataFrame, dict[str, pd.DataFrame]]:
    """Full pipeline → DISTINCT (s,p,o) triple set + intermediate frames."""
    spans = oracle_spans(documents)
    mentions = oracle_mentions(spans)
    edges = oracle_norm_edges(mentions, embeddings)
    comp = oracle_components(sorted(mentions["norm_text"].unique()), edges)
    entities = oracle_entities(mentions, comp)
    labels = oracle_labels(mentions, comp)

    trips: set[tuple[str, str, str]] = set()
    for r in mentions.itertuples():
        trips.add((f"{G.DOC_IRI_PREFIX}{r.doc_id}", G.P_MENTIONS, r.mention_iri))
        trips.add((r.mention_iri, G.P_TYPE, G.O_ENTITY_CLASS))
    for r in spans.itertuples():
        if r.kind == "media":
            trips.add((f"{G.DOC_IRI_PREFIX}{r.doc_id}", G.P_HAS_MEDIA, r.media_ref))
    for r in documents.itertuples():
        trips.add((f"{G.DOC_IRI_PREFIX}{r.doc_id}", G.P_LANGUAGE, r.lang))
    # sameAs between mention IRIs: same component, distinct IRIs, a < b;
    # proxy class = best-scoring rulebase match over the members' first
    # tokens (grammar.CLASS_RULES; ties broken by class name asc)
    rules = {t: (c, s) for t, c, s in G.CLASS_RULES}
    iris = mentions[["norm_text", "mention_iri"]].drop_duplicates()
    iris = iris.assign(root=iris["norm_text"].map(comp))
    for _, grp in iris.groupby("root"):
        members = sorted(set(grp["mention_iri"]))
        eid = entity_id(members[0])
        cands = {
            rules.get(n.split(" ")[0], (G.DEFAULT_CLASS, G.DEFAULT_CLASS_SCORE))
            for n in grp["norm_text"]
        }
        cls = sorted(cands, key=lambda cs: (-cs[1], cs[0]))[0][0]
        trips.add((eid, G.P_TYPE, cls))
        for mi in members:
            trips.add((eid, G.P_SAME_AS, mi))
    for r in labels.itertuples():
        trips.add((r.entity_id, G.P_LABEL, r.label))
        trips.add((r.entity_id, G.P_SCORE, str(int(r.n_mentions))))

    tdf = pd.DataFrame(sorted(trips), columns=["s", "p", "o"])
    inter = {
        "spans": spans,
        "mentions": mentions,
        "edges": edges,
        "entities": entities,
        "labels": labels,
    }
    return tdf, inter


def load_documents(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def load_embeddings(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/embeddings.parquet")


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    docs = load_documents(sf_dir)
    embs = load_embeddings(sf_dir)
    triples, inter = oracle_triples(docs, embs)
    print("docs", len(docs), "spans", len(inter["spans"]),
          "mentions", len(inter["mentions"]), "distinct norms",
          inter["mentions"]["norm_text"].nunique(), "edges", len(inter["edges"]),
          "entities", inter["entities"]["entity_id"].nunique(),
          "members", len(inter["entities"]), "triples", len(triples))
    sizes = inter["entities"].groupby("entity_id").size()
    print("component size: max", sizes.max(), "p99", int(sizes.quantile(0.99)))
