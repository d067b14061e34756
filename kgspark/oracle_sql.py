"""DuckDB oracle-SQL builders for the driver's correctness gate.

Every SQL string here re-states, in DuckDB's dialect, the exact
deterministic spec from grammar.py that the Spark pipeline implements —
a third independent implementation (after the Spark engine and the
pure-pandas oracle).  The driver runs these side-by-side with
``queries()`` at sf0.01 and compares row-count + schema +
order-insensitive value hash.

Conventions for cross-engine hash equality:
* float outputs are emitted as ``floor(1e6 * x)`` BIGINT in BOTH
  engines (raw doubles never hash-compare);
* every computed column is aliased identically on both sides;
* all hashes are explicit int64 arithmetic (no engine hash builtins).

Tables referenced are the driver's pre-registered views: region nation
customer supplier part orders lineitem events documents embeddings.
"""

from __future__ import annotations

from . import grammar as G

# ---------------------------------------------------------------------------
# Interleaved spans (mirrors kgspark.fixtures.SPANS_EXPR exactly).
# ---------------------------------------------------------------------------
C = G.CHUNK_TOKENS

SPANS_CTE = f"""
doc_toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, lang, source,
         string_split(text, ' ') AS toks,
         'media://vec/' || CAST(doc_id % {G.MEDIA_MOD} AS VARCHAR) AS mref
  FROM documents
),
chunks AS MATERIALIZED (
  SELECT doc_id, lang, source, mref, k,
         array_to_string(list_slice(toks, {C}*k + 1, {C}*k + {C}), ' ') AS chunk,
         CASE WHEN k = 0 THEN 0
              ELSE length(array_to_string(list_slice(toks, 1, {C}*k), ' ')) + 1
         END AS off
  FROM doc_toks,
       UNNEST(generate_series(0, CAST(ceil(len(toks) / {C}.0) AS INT) - 1)) AS t(k)
),
spans AS (
  SELECT doc_id, lang, source, 2*k + seq AS ord,
         CASE WHEN seq = 0 THEN 'text' ELSE 'media' END AS kind,
         CASE WHEN seq = 0 THEN chunk ELSE '' END AS text,
         CASE WHEN seq = 0 THEN '' ELSE mref END AS media_ref,
         CASE WHEN seq = 0 THEN off ELSE off + length(chunk) END AS "offset"
  FROM chunks, UNNEST([0, 1]) AS u(seq)
  WHERE seq = 0 OR (k + 1) % {G.MEDIA_EVERY} = 0
),
spans_pos AS MATERIALIZED (
  SELECT doc_id, lang, source,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY ord) - 1 AS INT)
           AS span_pos,
         kind, text, media_ref, CAST("offset" AS INT) AS "offset"
  FROM spans
)
"""

SPANS_SQL = f"""
WITH {SPANS_CTE}
SELECT doc_id, span_pos, kind, text, media_ref, "offset"
FROM spans_pos
ORDER BY doc_id, span_pos
"""

# ---------------------------------------------------------------------------
# Mentions (mirrors processors/text.py kernel).
# ---------------------------------------------------------------------------
_PAT = G.MENTION_PATTERN

MENTIONS_CTE = f"""
runs AS (
  SELECT doc_id, lang, source, span_pos,
         regexp_extract_all(' ' || text || ' ', '{_PAT}', 1) AS ms
  FROM spans_pos WHERE kind = 'text'
),
mentions AS MATERIALIZED (
  SELECT doc_id, lang, source, span_pos,
         CAST(generate_subscripts(ms, 1) - 1 AS INT) AS mention_ord,
         unnest(ms) AS mention_text,
         unnest(ms) AS norm_text,
         '{G.MENTION_IRI_PREFIX}' || source || '/' || replace(unnest(ms), ' ', '_')
           AS mention_iri
  FROM runs
)
"""

MENTIONS_SQL = f"""
WITH {SPANS_CTE}, {MENTIONS_CTE}
SELECT doc_id, lang, source, span_pos, mention_ord, mention_text,
       norm_text, mention_iri
FROM mentions
ORDER BY doc_id, span_pos, mention_ord
"""

# ---------------------------------------------------------------------------
# Linking: distinct norms → token-block candidates → Jaccard/cosine scores
# (mirrors kgspark.link).
# ---------------------------------------------------------------------------
_TOKCODE = "(ascii(substr(t,1,1))*65536 + ascii(substr(t,2,1))*256 + length(t))::BIGINT"

NORMS_CTE = f"""
norms AS (SELECT DISTINCT norm_text AS norm FROM mentions),
ntok AS MATERIALIZED (
  SELECT norm,
         list_distinct(string_split(norm, ' ')) AS tokset,
         list_reduce(
           list_prepend(0::BIGINT,
             list_transform(string_split(norm, ' '), t -> {_TOKCODE})),
           (a, b) -> (a*31 + b) % {G.FP_MOD}
         ) % (SELECT count(*) FROM embeddings) AS vec_id
  FROM norms
)
"""

EDGES_CTE = f"""
inv AS (SELECT norm, unnest(tokset) AS tok FROM ntok),
cand AS MATERIALIZED (
  SELECT a.norm AS norm_a, b.norm AS norm_b
  FROM inv a JOIN inv b ON a.tok = b.tok AND a.norm < b.norm
  GROUP BY 1, 2
),
scored AS MATERIALIZED (
  SELECT norm_a, norm_b,
         len(list_intersect(na.tokset, nb.tokset))::DOUBLE
           / len(list_distinct(na.tokset || nb.tokset)) AS jaccard,
         CASE WHEN na.vec_id = nb.vec_id THEN 1.0
              ELSE list_cosine_similarity(ea.embedding::DOUBLE[],
                                          eb.embedding::DOUBLE[])
         END AS cosine
  FROM cand
  JOIN ntok na ON cand.norm_a = na.norm
  JOIN ntok nb ON cand.norm_b = nb.norm
  JOIN embeddings ea ON ea.vec_id = na.vec_id
  JOIN embeddings eb ON eb.vec_id = nb.vec_id
),
edges AS MATERIALIZED (
  SELECT * FROM scored
  WHERE jaccard >= {G.JACCARD_TAU}
     OR (jaccard >= {G.COSINE_JACCARD_MIN} AND cosine >= {G.COSINE_TAU})
)
"""

EDGES_SQL = f"""
WITH {SPANS_CTE}, {MENTIONS_CTE}, {NORMS_CTE}, {EDGES_CTE}
SELECT norm_a, norm_b,
       CAST(floor(1e6 * jaccard) AS BIGINT) AS jaccard_e6,
       CAST(round(1e6 * cosine) AS BIGINT) AS cosine_e6
FROM edges ORDER BY norm_a, norm_b
"""

# ---------------------------------------------------------------------------
# Connected components (recursive min-label closure) → entities / attrs /
# proxy triples (mirrors kgspark.cc + kgspark.generate).
# ---------------------------------------------------------------------------
CC_CTE = f"""
bidir AS MATERIALIZED (
  SELECT norm_a AS s, norm_b AS d FROM edges
  UNION
  SELECT norm_b AS s, norm_a AS d FROM edges
),
reach AS (
  SELECT norm AS node, norm AS label FROM norms
  UNION
  SELECT b.d AS node, r.label FROM reach r JOIN bidir b ON b.s = r.node
),
labels AS MATERIALIZED (SELECT node, min(label) AS label FROM reach GROUP BY node)
"""

ENTITIES_CTE = f"""
iris AS MATERIALIZED (SELECT DISTINCT norm_text, mention_iri FROM mentions),
memb AS MATERIALIZED (
  SELECT l.label, i.mention_iri, i.norm_text
  FROM iris i JOIN labels l ON i.norm_text = l.node
),
eids AS MATERIALIZED (
  SELECT label,
         '{G.ENTITY_IRI_PREFIX}' || substr(sha256(min(mention_iri)), 1, 32)
           || '{G.ENTITY_IRI_SUFFIX}' AS entity_id
  FROM memb GROUP BY label
),
entities AS MATERIALIZED (
  SELECT DISTINCT e.entity_id, m.mention_iri AS member_iri
  FROM memb m JOIN eids e USING (label)
)
"""

def _lang_rank_sql(col: str) -> str:
    whens = " ".join(
        f"WHEN '{l}' THEN {i+1}" for i, l in enumerate(G.LANG_PREF)
    )
    return f"CASE {col} {whens} ELSE {len(G.LANG_PREF) + 1} END"

ATTRS_CTE = f"""
mm AS MATERIALIZED (
  SELECT m.*, l.label AS root
  FROM mentions m JOIN labels l ON m.norm_text = l.node
),
counts AS MATERIALIZED (
  SELECT root, count(DISTINCT mention_iri) AS n_members,
         count(*) AS n_mentions
  FROM mm GROUP BY root
),
ranked AS MATERIALIZED (
  SELECT root, norm_text, lang,
         row_number() OVER (
           PARTITION BY root
           ORDER BY {_lang_rank_sql('lang')}, norm_text
         ) AS rn
  FROM (SELECT DISTINCT root, norm_text, lang FROM mm)
),
attrs AS MATERIALIZED (
  SELECT e.entity_id, r.norm_text AS label, r.lang AS label_lang,
         ec.cls AS class, c.n_members, c.n_mentions,
         c.n_mentions AS score
  FROM counts c
  JOIN ranked r ON r.root = c.root AND r.rn = 1
  JOIN eids e ON e.label = c.root
  JOIN eclass ec ON ec.entity_id = e.entity_id
)
"""

# Property rulebase (O24 full D7 form; mirrors generate.entity_props).
_PROP_RULES_ROWS = ", ".join(
    f"('{p}', '{sh}', {pr}, {lp})" for p, sh, pr, lp in G.PROPERTY_RULES
)

PROPS_CTE = f"""
prules(pred, shape, prio, lang_pref) AS (VALUES {_PROP_RULES_ROWS}),
pcand AS MATERIALIZED (
  SELECT DISTINCT entity_id, shape, value, lang FROM (
    SELECT e.entity_id, 'norm_multi' AS shape, mm.norm_text AS value, mm.lang
    FROM mm JOIN eids e ON e.label = mm.root
    WHERE len(string_split(mm.norm_text, ' ')) >= 2
    UNION ALL
    SELECT e.entity_id, 'norm_any', mm.norm_text, mm.lang
    FROM mm JOIN eids e ON e.label = mm.root
    UNION ALL
    SELECT e.entity_id, 'first_token', string_split(mm.norm_text, ' ')[1], mm.lang
    FROM mm JOIN eids e ON e.label = mm.root
    UNION ALL
    SELECT e.entity_id, 'source', mm.source, mm.lang
    FROM mm JOIN eids e ON e.label = mm.root
    UNION ALL
    SELECT e.entity_id, 'lang', mm.lang, mm.lang
    FROM mm JOIN eids e ON e.label = mm.root
  )
),
eprops AS MATERIALIZED (
  SELECT entity_id, pred, value,
         CASE WHEN lang_pref = 1 THEN lang ELSE '' END AS value_lang
  FROM (
    SELECT c.entity_id, r.pred, c.value, c.lang, r.lang_pref,
           row_number() OVER (
             PARTITION BY c.entity_id, r.pred
             ORDER BY r.prio,
                      CASE WHEN r.lang_pref = 1
                           THEN {_lang_rank_sql('c.lang')} ELSE 0 END,
                      c.value, c.lang
           ) AS rn
    FROM pcand c JOIN prules r USING (shape)
  ) WHERE rn = 1
)
"""

# Rulebase class selection (O25; mirrors generate.entity_classes).
_RULES_ROWS = ", ".join(f"('{t}', '{c}', {s})" for t, c, s in G.CLASS_RULES)

ECLASS_CTE = f"""
rules(tok, cls, rscore) AS (VALUES {_RULES_ROWS}),
ecand AS MATERIALIZED (
  SELECT DISTINCT e.entity_id,
         coalesce(r.cls, '{G.DEFAULT_CLASS}') AS cls,
         coalesce(r.rscore, {G.DEFAULT_CLASS_SCORE}) AS rscore
  FROM memb m JOIN eids e USING (label)
  LEFT JOIN rules r ON r.tok = string_split(m.norm_text, ' ')[1]
),
eclass AS MATERIALIZED (
  SELECT entity_id, cls FROM ecand
  QUALIFY row_number() OVER (PARTITION BY entity_id
                             ORDER BY rscore DESC, cls ASC) = 1
)
"""

_KG_CTES = "WITH RECURSIVE " + ", ".join(
    [SPANS_CTE, MENTIONS_CTE, NORMS_CTE, EDGES_CTE, CC_CTE, ENTITIES_CTE,
     ECLASS_CTE, ATTRS_CTE]
)

# The full-term triple union (D3: o_kind/o_lang/o_datatype) — shared by
# the triple, quad-count, predicate-count and round-trip oracles.
_DOC_BRANCHES = f"""
    SELECT '{G.DOC_IRI_PREFIX}' || doc_id AS g,
           '{G.DOC_IRI_PREFIX}' || doc_id AS s, '{G.P_MENTIONS}' AS p,
           mention_iri AS o, 'iri' AS o_kind, '' AS o_lang, '' AS o_datatype
    FROM mentions
    UNION ALL
    SELECT '{G.DOC_IRI_PREFIX}' || doc_id, mention_iri, '{G.P_TYPE}',
           '{G.O_ENTITY_CLASS}', 'iri', '', '' FROM mentions
    UNION ALL
    SELECT '{G.DOC_IRI_PREFIX}' || doc_id, '{G.DOC_IRI_PREFIX}' || doc_id,
           '{G.P_HAS_MEDIA}', media_ref, 'iri', '', ''
    FROM spans_pos WHERE kind = 'media'
    UNION ALL
    SELECT '{G.DOC_IRI_PREFIX}' || doc_id, '{G.DOC_IRI_PREFIX}' || doc_id,
           '{G.P_LANGUAGE}', lang, 'literal', '', '' FROM doc_toks
"""

_PROXY_BRANCHES = f"""
    SELECT '{G.ROOT_GRAPH}' AS g, entity_id AS s, '{G.P_SAME_AS}' AS p,
           member_iri AS o, 'iri' AS o_kind, '' AS o_lang, '' AS o_datatype
    FROM entities
    UNION ALL
    SELECT '{G.ROOT_GRAPH}', entity_id, '{G.P_TYPE}', cls, 'iri', '', ''
    FROM eclass
    UNION ALL
    SELECT '{G.ROOT_GRAPH}', entity_id, '{G.P_LABEL}', label, 'literal',
           label_lang, '' FROM attrs
    UNION ALL
    SELECT '{G.ROOT_GRAPH}', entity_id, '{G.P_SCORE}',
           CAST(score AS VARCHAR), 'literal', '', '{G.DT_INTEGER}' FROM attrs
"""

_QUADS_UNION = f"({_DOC_BRANCHES} UNION ALL {_PROXY_BRANCHES})"

ENTITIES_SQL = f"""
{_KG_CTES}
SELECT entity_id, member_iri FROM entities ORDER BY entity_id, member_iri
"""

ENTITY_ATTRS_SQL = f"""
{_KG_CTES}
SELECT entity_id, label, label_lang, class, n_members, n_mentions, score
FROM attrs ORDER BY entity_id
"""

ENTITY_PROPS_SQL = f"""
{_KG_CTES}, {PROPS_CTE}
SELECT entity_id, pred, value, value_lang
FROM eprops ORDER BY entity_id, pred
"""

BGP_MATCH_SQL = f"""
{_KG_CTES},
tri AS (SELECT DISTINCT s, p, o FROM {_QUADS_UNION})
SELECT t1.s AS e, t2.o AS l, t3.o AS n
FROM tri t1
JOIN tri t2 ON t2.s = t1.s AND t2.p = 'rdfs:label'
JOIN tri t3 ON t3.s = t1.s AND t3.p = 'ex:score'
WHERE t1.p = 'rdf:type' AND t1.o = 'ex:Commerce'
"""

BGP_OPTIONAL_SQL = f"""
{_KG_CTES},
tri AS (SELECT DISTINCT s, p, o FROM {_QUADS_UNION})
SELECT t1.s AS d, t1.o AS lang, t2.o AS media
FROM tri t1
LEFT JOIN tri t2 ON t2.s = t1.s AND t2.p = 'ex:hasMedia'
WHERE t1.p = 'dc:language'
"""

# Per-entity license + representative media (spindle license.c/media.c
# analogue): independent re-derivation over the mention→label→entity
# chain with the same rule tables inlined as VALUES.
_ENTITY_MEDIA_BODY = f"""
WITH docs_e AS (
  SELECT DISTINCT e.entity_id, m.doc_id, m.source
  FROM mentions m
  JOIN labels l ON l.node = m.norm_text
  JOIN eids e USING (label)
),
lic AS (
  SELECT entity_id, license,
         row_number() OVER (PARTITION BY entity_id
                            ORDER BY lic_rank, license) AS rn
  FROM (SELECT DISTINCT d.entity_id, r.license, r.lic_rank
        FROM docs_e d
        JOIN (VALUES (0, 'ex:license/open', 1), (1, 'ex:license/attribution', 2), (2, 'ex:license/restricted', 3))
          AS r(rights_bucket, license, lic_rank)
          ON r.rights_bucket =
             CAST(regexp_extract(d.source, '([0-9]+)$', 1) AS INT)
               % 3)
),
med AS (
  SELECT entity_id, media_ref, media_class,
         row_number() OVER (PARTITION BY entity_id
                            ORDER BY med_rank, media_ref) AS rn
  FROM (SELECT DISTINCT d.entity_id, s.media_ref, r.media_class, r.med_rank
        FROM docs_e d
        JOIN spans_pos s ON s.doc_id = d.doc_id AND s.kind = 'media'
        JOIN (VALUES (0, 'image', 1), (1, 'audio', 2), (2, 'video', 3), (3, 'data', 4))
          AS r(kind_bucket, media_class, med_rank)
          ON r.kind_bucket =
             CAST(regexp_extract(s.media_ref, '([0-9]+)$', 1) AS INT)
               % 4)
)
SELECT l.entity_id, l.license, m.media_ref AS best_media, m.media_class
FROM (SELECT entity_id, license FROM lic WHERE rn = 1) l
LEFT JOIN (SELECT entity_id, media_ref, media_class FROM med WHERE rn = 1) m
  USING (entity_id)
"""

ENTITY_MEDIA_SQL = f"""
{_KG_CTES},
em AS ({_ENTITY_MEDIA_BODY})
SELECT entity_id, license, best_media, media_class FROM em
"""

MEDIA_TRIPLES_SQL = f"""
{_KG_CTES},
em AS ({_ENTITY_MEDIA_BODY})
SELECT entity_id AS s, 'ex:license' AS p, license AS o FROM em
UNION ALL
SELECT entity_id, 'ex:bestMedia', best_media FROM em
WHERE best_media IS NOT NULL
"""

# SPARQL FILTER + SELECT DISTINCT (round-4: the quilt-consumer surface).
# CAST + regex mirror the Spark side's CAST(n AS INT) / rlike exactly.
BGP_FILTER_SQL = f"""
{_KG_CTES},
tri AS (SELECT DISTINCT s, p, o FROM {_QUADS_UNION})
SELECT DISTINCT t1.s AS e, t2.o AS l, t3.o AS n
FROM tri t1
JOIN tri t2 ON t2.s = t1.s AND t2.p = 'rdfs:label'
JOIN tri t3 ON t3.s = t1.s AND t3.p = 'ex:score'
WHERE t1.p = 'rdf:type' AND t1.o = 'ex:Commerce'
  AND CAST(t3.o AS INT) >= 3 AND regexp_matches(t2.o, '^[a-m]')
"""

# SPARQL text front-end (ORDER BY ?n DESC, ?l, ?e is a total order so
# the LIMIT cut is engine-independent; comparison stays binary-collated
# strings on both engines).
SPARQL_TOPK_SQL = f"""
{_KG_CTES},
tri AS (SELECT DISTINCT s, p, o FROM {_QUADS_UNION})
SELECT e, l, n FROM (
  SELECT DISTINCT t1.s AS e, t2.o AS l, t3.o AS n
  FROM tri t1
  JOIN tri t2 ON t2.s = t1.s AND t2.p = 'rdfs:label'
  JOIN tri t3 ON t3.s = t1.s AND t3.p = 'ex:score'
  WHERE t1.p = 'rdf:type' AND t1.o = 'ex:Commerce'
    AND CAST(t3.o AS INT) >= 2
)
ORDER BY n DESC, l, e LIMIT 25
"""

# SPARQL CONSTRUCT: template instantiation = one select per template
# pattern over the solution set, UNION, DISTINCT.
SPARQL_CONSTRUCT_SQL = f"""
{_KG_CTES},
tri AS (SELECT DISTINCT s, p, o FROM {_QUADS_UNION}),
sol AS (
  SELECT t1.s AS e, t2.o AS l, t3.o AS n
  FROM tri t1
  JOIN tri t2 ON t2.s = t1.s AND t2.p = 'rdfs:label'
  JOIN tri t3 ON t3.s = t1.s AND t3.p = 'ex:score'
  WHERE t1.p = 'rdf:type' AND t1.o = 'ex:Commerce'
)
SELECT DISTINCT s, p, o FROM (
  SELECT e AS s, 'rdf:type' AS p, 'ex:Summary' AS o FROM sol
  UNION ALL SELECT e, 'rdfs:label', l FROM sol
  UNION ALL SELECT e, 'ex:score', n FROM sol
)
"""

# SPARQL GROUP BY aggregation (text front-end): exact integer sum.
SPARQL_GROUPBY_SQL = f"""
{_KG_CTES},
tri AS (SELECT DISTINCT s, p, o FROM {_QUADS_UNION})
SELECT t1.o AS t,
       CAST(COUNT(DISTINCT t1.s) AS BIGINT) AS n,
       CAST(SUM(CAST(t2.o AS BIGINT)) AS BIGINT) AS total
FROM tri t1
JOIN tri t2 ON t2.s = t1.s AND t2.p = 'ex:score'
WHERE t1.p = 'rdf:type'
GROUP BY t1.o
"""

# SPARQL LANG() over the full-term model.
SPARQL_LANG_SQL = f"""
{_KG_CTES},
tfull AS (SELECT DISTINCT s, p, o, o_lang FROM {_QUADS_UNION})
SELECT s AS e, o AS l FROM tfull
WHERE p = 'rdfs:label' AND o_lang = 'en'
"""

# SPARQL GRAPH clause: per-named-graph counts over the distinct quads.
SPARQL_GRAPH_SQL = f"""
{_KG_CTES},
q AS (SELECT DISTINCT g, s, p, o FROM {_QUADS_UNION})
SELECT g, CAST(count(*) AS BIGINT) AS n
FROM q WHERE p = 'ex:mentions' GROUP BY g
"""

# SPARQL UNION of BGP groups — disjoint variables NULL-padded (bag
# semantics, matching bgp_union's unionByName).
BGP_UNION_SQL = f"""
{_KG_CTES},
tri AS (SELECT DISTINCT s, p, o FROM {_QUADS_UNION})
SELECT t1.s AS e, t2.o AS l,
       CAST(NULL AS VARCHAR) AS d, CAST(NULL AS VARCHAR) AS lang
FROM tri t1
JOIN tri t2 ON t2.s = t1.s AND t2.p = 'rdfs:label'
WHERE t1.p = 'rdf:type' AND t1.o = 'ex:Commerce'
UNION ALL
SELECT CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), s, o
FROM tri WHERE p = 'dc:language'
"""

# SPARQL property path (owl:sameAs|^owl:sameAs)+ — the coref closure.
# Independent re-derivation: recursive CTE over the UNDIRECTED sameAs
# edge set (set-semantics UNION terminates the recursion); the Spark
# side computes the same relation via connected components.
SAMEAS_CLOSURE_SQL = f"""
{_KG_CTES},
tri AS (SELECT DISTINCT s, p, o FROM {_QUADS_UNION}),
sa_edges AS (
  SELECT s AS a, o AS b FROM tri WHERE p = 'owl:sameAs'
  UNION
  SELECT o AS a, s AS b FROM tri WHERE p = 'owl:sameAs'
),
sa_reach AS (
  SELECT a, b FROM sa_edges
  UNION
  SELECT r.a, e.b FROM sa_reach r JOIN sa_edges e ON e.a = r.b
)
SELECT a AS x, b AS y FROM sa_reach WHERE a < b
"""

# Closure degree: count of reachable nodes (incl. self) per node —
# the recursive closure feeding an aggregate instead of pair output.
SAMEAS_DEGREE_SQL = f"""
{_KG_CTES},
tri AS (SELECT DISTINCT s, p, o FROM {_QUADS_UNION}),
sa_edges AS (
  SELECT s AS a, o AS b FROM tri WHERE p = 'owl:sameAs'
  UNION
  SELECT o AS a, s AS b FROM tri WHERE p = 'owl:sameAs'
),
sa_reach AS (
  SELECT a, b FROM sa_edges
  UNION
  SELECT r.a, e.b FROM sa_reach r JOIN sa_edges e ON e.a = r.b
)
SELECT a AS x, CAST(count(DISTINCT b) AS BIGINT) AS n_reach
FROM sa_reach GROUP BY a
"""

ENTITY_COOCCURRENCE_SQL = f"""
{_KG_CTES},
doc_ents AS (
  SELECT DISTINCT mm.doc_id, e.entity_id
  FROM mm JOIN eids e ON e.label = mm.root
)
SELECT a.entity_id AS entity_a, b.entity_id AS entity_b,
       count(*) AS n_docs
FROM doc_ents a JOIN doc_ents b
  ON b.doc_id = a.doc_id AND a.entity_id < b.entity_id
GROUP BY 1, 2
"""

PROPS_TRIPLES_SQL = f"""
{_KG_CTES}, {PROPS_CTE}
SELECT entity_id AS s, pred AS p, value AS o,
       'literal' AS o_kind, value_lang AS o_lang, '' AS o_datatype
FROM eprops ORDER BY s, p
"""

TRIPLES_SQL = f"""
{_KG_CTES}
SELECT DISTINCT s, p, o FROM {_QUADS_UNION} ORDER BY s, p, o
"""

TRIPLES_FULL_SQL = f"""
{_KG_CTES}
SELECT DISTINCT s, p, o, o_kind, o_lang, o_datatype FROM {_QUADS_UNION}
ORDER BY s, p, o, o_kind, o_lang, o_datatype
"""

QUADS_FULL_SQL = f"""
{_KG_CTES}
SELECT DISTINCT g, s, p, o, o_kind, o_lang, o_datatype FROM {_QUADS_UNION}
ORDER BY g, s, p, o, o_kind, o_lang, o_datatype
"""

GRAPH_COUNTS_SQL = f"""
{_KG_CTES}
SELECT g, count(*) AS n FROM (
  SELECT DISTINCT g, s, p, o, o_kind, o_lang, o_datatype FROM {_QUADS_UNION}
) GROUP BY g ORDER BY g
"""

ENTITY_CLASS_SQL = f"""
{_KG_CTES}
SELECT entity_id, cls AS class FROM eclass ORDER BY entity_id
"""

MENTION_COUNTS_SQL = f"""
WITH {SPANS_CTE}, {MENTIONS_CTE}
SELECT norm_text, count(*) AS n, count(DISTINCT doc_id) AS n_docs
FROM mentions GROUP BY norm_text ORDER BY norm_text
"""

MEDIA_FEATURES_SQL = f"""
WITH {SPANS_CTE}
SELECT doc_id, span_pos, media_ref,
  coalesce(nullif(regexp_extract(media_ref, '^([a-z0-9]+)://', 1), ''), 'unknown')
    AS media_kind,
  CAST(length(media_ref) AS INT) AS ref_bytes,
  CAST(coalesce(nullif(regexp_extract(media_ref, 'media://vec/([0-9]+)$', 1), ''), '-1')
    AS BIGINT) AS vec_id,
  list_reduce(
    list_prepend(0::BIGINT,
      list_transform(generate_series(1, length(media_ref)),
                     i -> ascii(substr(media_ref, i, 1))::BIGINT)),
    (a, b) -> (a*31 + b) % {G.FP_MOD}) AS content_fp
FROM spans_pos WHERE kind = 'media'
"""

SPAN_INVARIANT_SQL = f"""
WITH {SPANS_CTE}
SELECT doc_id, CAST(count(*) AS INT) AS n_spans,
  md5(string_agg(kind || '|' || text || '|' || media_ref || '|'
                 || CAST("offset" AS VARCHAR), chr(10) ORDER BY span_pos)) AS sig
FROM spans_pos GROUP BY doc_id
"""

# ---------------------------------------------------------------------------
# Relational operator-coverage oracles (SURVEY.md §2 sketches).
# ---------------------------------------------------------------------------
_E6 = "CAST(floor({expr} * 1000000.0) AS BIGINT)"


def _e6(expr: str) -> str:
    return _E6.format(expr=expr)


RELATIONAL_SQL = {
    "tpch_q1": f"""
        SELECT l_returnflag, l_linestatus,
               CAST(sum({_e6('l_quantity')}) AS BIGINT) AS sum_qty_e6,
               CAST(sum({_e6('l_extendedprice * (1 - l_discount)')}) AS BIGINT) AS revenue_e6,
               count(*) AS n
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "revenue_by_nation": f"""
        SELECT n_name, CAST(sum({_e6('o_totalprice')}) AS BIGINT) AS revenue_e6,
               count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "customers_without_orders": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "order_priorities_with_lineitems": """
        SELECT o_orderpriority, count(*) AS n FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        GROUP BY o_orderpriority
    """,
    "top2_lineitems_per_order": """
        SELECT l_orderkey, l_linenumber, rn FROM (
          SELECT l_orderkey, l_linenumber,
                 row_number() OVER (PARTITION BY l_orderkey
                   ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rn
          FROM lineitem) WHERE rn <= 2
    """,
    "tpch_q3_topk": f"""
        SELECT l_orderkey, epoch_us(o_orderdate) AS orderdate_us,
               CAST(sum({_e6('l_extendedprice * (1 - l_discount)')}) AS BIGINT)
                 AS revenue_e6
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = (SELECT min(c_mktsegment) FROM customer)
          AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
          AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue_e6 DESC, l_orderkey ASC LIMIT 10
    """,
    "event_moving_sum": f"""
        SELECT user_id, event_id,
               CAST(sum(v) OVER w AS BIGINT) AS mov_sum_e6,
               CAST(count(*) OVER w AS BIGINT) AS n_window
        FROM (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                     {_e6('value')} AS v
              FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                     RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
    """,
    "event_gaps": """
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               epoch_us(lead(ts) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id)) AS next_ts_us
        FROM events
    """,
    "top10_orders": f"""
        SELECT o_orderkey, {_e6('o_totalprice')} AS totalprice_e6
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    "lineitem_except_all": """
        SELECT l_orderkey, l_linenumber FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
        EXCEPT ALL
        SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_discount > 0.05
    """,
    "distinct_segments": "SELECT DISTINCT c_mktsegment FROM customer",
    "events_isin_counts": """
        SELECT event_type, count(*) AS n FROM events
        WHERE event_type IN (SELECT event_type FROM
          (SELECT DISTINCT event_type FROM events ORDER BY event_type LIMIT 2))
        GROUP BY event_type
    """,
    "events_json_k": """
        SELECT event_id,
               CAST(nullif(regexp_extract(props, '"k": ([0-9]+)', 1), '') AS BIGINT) AS k
        FROM events
    """,
    "best_order_per_customer": f"""
        SELECT o_custkey, o_orderkey AS best_orderkey,
               {_e6('o_totalprice')} AS totalprice_e6
        FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn FROM orders)
        WHERE rn = 1
    """,
    "event_type_stats": f"""
        SELECT event_type, count(*) AS n,
               CAST(sum({_e6('value')}) AS BIGINT) AS sum_value_e6
        FROM events GROUP BY event_type
    """,
    "latest_event_per_user": """
        SELECT user_id, event_id, epoch_us(ts) AS ts_us
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        WHERE rn = 1
    """,
    "norm_iri_demo": r"""
        WITH raw AS (
          SELECT c_custkey,
                 'HTTP://Example.COM:80/c/' || replace(c_name, ' ', '_')
                 || CASE WHEN c_custkey % 3 = 0 THEN '?x=1' ELSE '' END AS raw_iri
          FROM customer
        ), step1 AS (
          SELECT c_custkey, raw_iri,
                 lower(regexp_extract(raw_iri,
                   '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)) AS sa,
                 regexp_replace(raw_iri,
                   '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '') AS rest
          FROM raw
        ), step2 AS (
          SELECT c_custkey, raw_iri,
                 CASE WHEN sa = '' THEN raw_iri ELSE sa || rest END AS c2
          FROM step1
        )
        SELECT c_custkey, raw_iri,
               regexp_replace(
                 regexp_replace(c2, '^(https?://[^/:?#]*):(?:80|443)(/|$)', '\1\2'),
                 '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)/$', '\1') AS norm_iri
        FROM step2
    """,
}

# ---------------------------------------------------------------------------
# Training-data-pipeline oracles (dedup / ANN / text analysis).
# Shared shingle CTE: token 3-gram codes (grammar.py NGRAM_N family).
# ---------------------------------------------------------------------------
_TC_NULL = (
    "(ascii(substr(coalesce({t}, ''), 1, 1))::BIGINT * 65536"
    " + ascii(substr(coalesce({t}, ''), 2, 1))::BIGINT * 256"
    " + length(coalesce({t}, ''))::BIGINT)"
)

SHINGLES_CTE = f"""
dtok AS (
  SELECT doc_id, lang, source, string_split(text, ' ') AS toks FROM documents
),
shingled AS (
  SELECT doc_id, lang, source,
    list_distinct(list_transform(
      generate_series(1, greatest(len(toks) - 2, 1)),
      i -> (({_TC_NULL.format(t='toks[i]')} * 31
             + {_TC_NULL.format(t='toks[i+1]')}) * 31
             + {_TC_NULL.format(t='toks[i+2]')}) % {G.FP_MOD}
    )) AS shingles
  FROM dtok
)
"""

DEDUP_EXACT_SQL = f"""
WITH keyed AS (
  SELECT doc_id,
    list_reduce(
      list_prepend(0::BIGINT,
        list_transform(list_slice(string_split(text, ' '), 1, 8),
                       t -> {_TOKCODE})),
      (a, b) -> (a*31 + b) % {G.FP_MOD}) AS key_fp
  FROM documents
)
SELECT key_fp, count(*) AS n_docs, min(doc_id) AS keep_doc_id
FROM keyed GROUP BY key_fp HAVING count(*) > 1
"""

# MinHash signatures via a permutation-parameter VALUES table.
_PERMS_ROWS = ", ".join(
    f"({i}, {G.hash_a(i)}, {G.hash_b(i)})" for i in range(G.MINHASH_PERMS)
)

MINHASH_LSH_PAIRS_SQL = f"""
WITH {SHINGLES_CTE},
perms(i, a, b) AS (VALUES {_PERMS_ROWS}),
codes AS (SELECT doc_id, unnest(shingles) AS code FROM shingled),
sig AS (
  SELECT doc_id, i, min((a * code + b) % {G.HASH_P}) AS mh
  FROM codes CROSS JOIN perms GROUP BY doc_id, i
),
bands AS (
  SELECT doc_id, CAST(i // {G.LSH_ROWS} AS INT) AS band_id,
         max(CASE WHEN i % {G.LSH_ROWS} = 0 THEN mh END) * {G.HASH_P}
           + max(CASE WHEN i % {G.LSH_ROWS} = 1 THEN mh END) AS band_hash
  FROM sig GROUP BY doc_id, CAST(i // {G.LSH_ROWS} AS INT)
),
cand AS (
  SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
  FROM bands a JOIN bands c
    ON a.band_id = c.band_id AND a.band_hash = c.band_hash
   AND a.doc_id < c.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
  CAST(floor(1e6 * (len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
    / (len(sa.shingles) + len(sb.shingles)
       - len(list_intersect(sa.shingles, sb.shingles))))) AS BIGINT)
    AS jaccard_e6
FROM cand
JOIN shingled sa ON sa.doc_id = cand.doc_a
JOIN shingled sb ON sb.doc_id = cand.doc_b
"""

_CLUSTERS_CTES = f"""
perms(i, a, b) AS (VALUES {_PERMS_ROWS}),
codes AS (SELECT doc_id, unnest(shingles) AS code FROM shingled),
sig AS (
  SELECT doc_id, i, min((a * code + b) % {G.HASH_P}) AS mh
  FROM codes CROSS JOIN perms GROUP BY doc_id, i
),
bands AS (
  SELECT doc_id, CAST(i // {G.LSH_ROWS} AS INT) AS band_id,
         max(CASE WHEN i % {G.LSH_ROWS} = 0 THEN mh END) * {G.HASH_P}
           + max(CASE WHEN i % {G.LSH_ROWS} = 1 THEN mh END) AS band_hash
  FROM sig GROUP BY doc_id, CAST(i // {G.LSH_ROWS} AS INT)
),
cand AS (
  SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
  FROM bands a JOIN bands c
    ON a.band_id = c.band_id AND a.band_hash = c.band_hash
   AND a.doc_id < c.doc_id
  GROUP BY 1, 2
),
nd AS MATERIALIZED (
  SELECT doc_a, doc_b FROM cand
  JOIN shingled sa ON sa.doc_id = cand.doc_a
  JOIN shingled sb ON sb.doc_id = cand.doc_b
  WHERE len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
      / (len(sa.shingles) + len(sb.shingles)
         - len(list_intersect(sa.shingles, sb.shingles))) >= 0.01
),
nodes AS (SELECT doc_a AS n FROM nd UNION SELECT doc_b FROM nd),
bidir AS (SELECT doc_a AS s, doc_b AS d FROM nd
          UNION SELECT doc_b, doc_a FROM nd),
reach AS (
  SELECT n AS node, n AS label FROM nodes
  UNION
  SELECT b.d, r.label FROM reach r JOIN bidir b ON b.s = r.node
),
ckeep AS MATERIALIZED (
  SELECT node AS doc_id, CAST(min(label) AS BIGINT) AS keep_doc_id
  FROM reach GROUP BY node
)
"""

DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE {SHINGLES_CTE}, {_CLUSTERS_CTES}
SELECT doc_id, keep_doc_id FROM ckeep
"""

_SIM_PERMS_ROWS = ", ".join(
    f"({b}, {G.hash_a(G.SIMHASH_HASH_OFFSET + b)}, {G.hash_b(G.SIMHASH_HASH_OFFSET + b)})"
    for b in range(G.SIMHASH_BITS)
)

DOC_SIMHASH_SQL = f"""
WITH {SHINGLES_CTE},
sperms(bit, a, b) AS (VALUES {_SIM_PERMS_ROWS}),
codes AS (SELECT doc_id, lang, unnest(shingles) AS code FROM shingled),
votes AS (
  SELECT doc_id, lang, bit,
         sum(CASE WHEN ((a * code + b) % {G.HASH_P}) % 2 = 1 THEN 1 ELSE -1 END) AS v
  FROM codes CROSS JOIN sperms GROUP BY doc_id, lang, bit
)
SELECT doc_id, lang,
       CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT)
         AS simhash
FROM votes GROUP BY doc_id, lang
"""

SIMHASH_PAIRS_SQL = f"""
WITH {SHINGLES_CTE},
sperms(bit, a, b) AS (VALUES {_SIM_PERMS_ROWS}),
codes AS (SELECT doc_id, lang, unnest(shingles) AS code FROM shingled),
votes AS (
  SELECT doc_id, lang, bit,
         sum(CASE WHEN ((a * code + b) % {G.HASH_P}) % 2 = 1 THEN 1 ELSE -1 END) AS v
  FROM codes CROSS JOIN sperms GROUP BY doc_id, lang, bit
),
sh AS (
  SELECT doc_id, lang,
         CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT)
           AS simhash
  FROM votes GROUP BY doc_id, lang
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {G.HAMMING_TAU}
"""
# NOTE: the oracle states the PURE hamming criterion (all-pairs is fine
# in DuckDB at sf0.01); the Spark side reaches the identical set via
# exact pigeonhole segment blocking — no metadata (lang/source) blocking
# on either side.

NGRAM_JACCARD_SQL = f"""
WITH {SHINGLES_CTE},
jac AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(list_intersect(a.shingles, b.shingles))::DOUBLE
           / (len(a.shingles) + len(b.shingles)
              - len(list_intersect(a.shingles, b.shingles))) AS jaccard
  FROM shingled a JOIN shingled b ON a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(floor(1e6 * jaccard) AS BIGINT) AS jaccard_e6
FROM jac WHERE jaccard >= 0.01
"""
# NOTE: all-pairs exact Jaccard (fine in DuckDB at sf0.01); the Spark
# side reaches the identical set via the prefix-filtered inverted-index
# join over shingle codes — no source/lang blocking on either side.

EMBEDDING_NEARDUP_SQL = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
       CAST(round(1e6 * list_cosine_similarity(a.embedding::DOUBLE[],
                                               b.embedding::DOUBLE[])) AS BIGINT)
         AS cosine_e6
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.25
"""

# Trained-quantizer near-dup: re-assign every vector to its nearest
# integer centroid, then pair within the ASSIGNED cell.
EMBEDDING_NEARDUP_TRAINED_SQL = """
WITH vd AS (
  SELECT vec_id, i AS dim,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS q
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) t(i)
),
cd AS (
  SELECT label, i AS dim,
         CAST(sum(CAST(round(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT))
              AS BIGINT) AS v
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) t(i)
  GROUP BY label, i
),
sc AS (
  SELECT vd.vec_id, cd.label,
         CAST(sum(vd.q * cd.v) AS BIGINT) AS dot,
         CAST(sum(vd.q * vd.q) AS BIGINT) AS qq
  FROM vd JOIN cd USING (dim) GROUP BY 1, 2
),
cn AS (SELECT label, CAST(sum(v * v) AS BIGINT) AS vv FROM cd GROUP BY label),
assigned AS (
  SELECT vec_id, label AS cell FROM (
    SELECT sc.vec_id, sc.label,
           CAST(dot AS DOUBLE) / sqrt(CAST(qq AS DOUBLE) * CAST(vv AS DOUBLE))
             AS ccos
    FROM sc JOIN cn USING (label)
  )
  QUALIFY row_number() OVER (PARTITION BY vec_id
                             ORDER BY ccos DESC, label ASC) = 1
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, aa.cell AS cell,
       CAST(round(1e6 * list_cosine_similarity(a.embedding::DOUBLE[],
                                               b.embedding::DOUBLE[])) AS BIGINT)
         AS cosine_e6
FROM embeddings a
JOIN assigned aa ON aa.vec_id = a.vec_id
JOIN assigned ab ON ab.cell = aa.cell
JOIN embeddings b ON b.vec_id = ab.vec_id AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.25
"""

ANN_TOPK_SQL = """
SELECT query_id, neighbor_id, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                           c.embedding::DOUBLE[]) DESC,
                    c.vec_id ASC) AS rank
  FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
  WHERE q.vec_id < 20
) WHERE rank <= 5
"""

ANN_IVF_SQL = """
SELECT query_id, neighbor_id, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                           c.embedding::DOUBLE[]) DESC,
                    c.vec_id ASC) AS rank
  FROM embeddings q JOIN embeddings c
    ON c.vec_id != q.vec_id AND c.label = q.label
  WHERE q.vec_id < 20
) WHERE rank <= 3
"""

TOP_TERMS_TFIDF_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
toks_f AS (SELECT doc_id, term FROM toks WHERE term != ''),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks_f GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM
       (SELECT DISTINCT doc_id, term FROM toks_f) GROUP BY term),
n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * length(bin(n.n // df.df)) AS score
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, CAST(score AS BIGINT) AS score, rn FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term ASC) AS rn
  FROM scored
) WHERE rn <= 3
"""

DOC_SPLIT_SQL = f"""
SELECT doc_id, lang,
       CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id, lang,
         (({G.hash_a(1)} * doc_id + {G.hash_b(1)}) % {G.HASH_P}) % 100 AS b
  FROM documents
)
"""

DOC_PACK_SQL = f"""
SELECT doc_id, split, shard, n_tok,
       CAST(start // {G.PACK_CAPACITY} AS BIGINT) AS seq_id,
       CAST(start % {G.PACK_CAPACITY} AS BIGINT) AS seq_off
FROM (
  SELECT doc_id, split, shard, n_tok,
         sum(n_tok) OVER (PARTITION BY split, shard ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) - n_tok AS start
  FROM (
    SELECT doc_id,
           CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
                ELSE 'test' END AS split,
           CAST((({G.hash_a(2)} * doc_id + {G.hash_b(2)}) % {G.HASH_P})
                  % {G.PACK_SHARDS} AS INT) AS shard,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
    FROM (
      SELECT doc_id, text,
             (({G.hash_a(1)} * doc_id + {G.hash_b(1)}) % {G.HASH_P}) % 100 AS b
      FROM documents
    )
  )
)
"""

_KMV_K = G.KMV_K  # single shared constant with queries.distinct_kmv_sketch
KMV_SKETCH_SQL = f"""
WITH {SHINGLES_CTE},
kmv_codes AS (
  SELECT DISTINCT lang, code FROM (
    SELECT lang, unnest(shingles) AS code FROM shingled
  )
),
kmv_hs AS (
  SELECT DISTINCT lang,
         ({G.hash_a(0)} * code + {G.hash_b(0)}) % {G.HASH_P} AS h
  FROM kmv_codes
),
kmv_ranked AS (
  SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
  FROM kmv_hs
),
kmv_n AS (SELECT lang, count(*) AS n_codes FROM kmv_codes GROUP BY lang),
kmv_kth AS (
  SELECT lang, max(h) AS kth_min FROM kmv_ranked WHERE rn <= {_KMV_K}
  GROUP BY lang HAVING count(*) = {_KMV_K}
)
SELECT n.lang,
       CAST(n.n_codes AS BIGINT) AS n_codes,
       CAST(coalesce(k.kth_min, 0) AS BIGINT) AS kth_min,
       CAST(CASE WHEN k.kth_min IS NOT NULL
                 THEN {(_KMV_K - 1) * G.HASH_P} // k.kth_min
                 ELSE n.n_codes END AS BIGINT) AS est
FROM kmv_n n LEFT JOIN kmv_kth k USING (lang)
"""

ANN_RECALL_SQL = """
WITH exact3 AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                             c.embedding::DOUBLE[]) DESC,
                      c.vec_id ASC) AS rank
    FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
    WHERE q.vec_id < 20
  ) WHERE rank <= 3
), ivf3 AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                             c.embedding::DOUBLE[]) DESC,
                      c.vec_id ASC) AS rank
    FROM embeddings q JOIN embeddings c
      ON c.vec_id != q.vec_id AND c.label = q.label
    WHERE q.vec_id < 20
  ) WHERE rank <= 3
), hits AS (
  SELECT e.query_id, count(*) AS n_hits
  FROM exact3 e
  JOIN ivf3 i ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
  GROUP BY e.query_id
)
SELECT q.query_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(floor(1e6 * coalesce(h.n_hits, 0) / 3) AS BIGINT) AS recall_e6
FROM (SELECT DISTINCT query_id FROM exact3) q
LEFT JOIN hits h USING (query_id)
"""

# O12 XSLT-analogue oracle: the template semantics restated directly
# over the documents table (title = first 3 tokens, lang-tagged; plain
# dc:language literal; xsd:integer size).
XML_TRANSFORM_SQL = """
WITH d AS (
  SELECT CAST(doc_id AS VARCHAR) AS id, lang,
         string_split(text, ' ') AS toks
  FROM documents
)
SELECT s, p, o, o_kind, o_lang, o_datatype FROM (
  SELECT 'doc://' || id AS s, 'rdfs:label' AS p,
         array_to_string(list_slice(toks, 1, 3), ' ') AS o,
         'literal' AS o_kind, lang AS o_lang, '' AS o_datatype FROM d
  UNION ALL
  SELECT 'doc://' || id, 'dc:language', lang, 'literal', '', '' FROM d
  UNION ALL
  SELECT 'doc://' || id, 'ex:size', CAST(len(toks) AS VARCHAR),
         'literal', '', 'xsd:integer' FROM d
)
"""

ANN_IVF_PROBE_SQL = """
WITH qd AS (
  SELECT vec_id AS query_id, i AS dim,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS q
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) t(i)
  WHERE vec_id < 20
),
cd AS (
  SELECT label, i AS dim,
         CAST(sum(CAST(round(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT))
              AS BIGINT) AS v
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) t(i)
  GROUP BY label, i
),
sc AS (
  SELECT qd.query_id, cd.label,
         CAST(sum(qd.q * cd.v) AS BIGINT) AS dot,
         CAST(sum(qd.q * qd.q) AS BIGINT) AS qq
  FROM qd JOIN cd USING (dim) GROUP BY 1, 2
),
cn AS (SELECT label, CAST(sum(v * v) AS BIGINT) AS vv FROM cd GROUP BY label),
cellcos AS (
  SELECT query_id, label,
         CAST(dot AS DOUBLE) / sqrt(CAST(qq AS DOUBLE) * CAST(vv AS DOUBLE))
           AS ccos
  FROM sc JOIN cn USING (label)
),
probed AS (
  SELECT query_id, label FROM cellcos
  QUALIFY row_number() OVER (PARTITION BY query_id
                             ORDER BY ccos DESC, label ASC) <= 2
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                           c.embedding::DOUBLE[]) DESC,
                    c.vec_id ASC) AS rank
  FROM embeddings q
  JOIN probed p ON p.query_id = q.vec_id
  JOIN embeddings c ON c.label = p.label AND c.vec_id != q.vec_id
  WHERE q.vec_id < 20
) WHERE rank <= 3
"""

_STOP_LIST = ", ".join(f"'{t}'" for t in G.STOP_TOKENS)

TEXT_QUALITY_SQL = f"""
WITH d AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
), feats AS (
  SELECT doc_id,
    len(toks) AS n_tokens,
    len(list_distinct(toks)) AS n_distinct,
    len(list_filter(toks, t -> t IN ({_STOP_LIST})))::DOUBLE / len(toks)
      AS stop_ratio,
    (length(text) - (len(toks) - 1))::DOUBLE / len(toks) AS mean_len,
    len(list_distinct(toks))::DOUBLE / len(toks) AS distinct_ratio
  FROM d
)
SELECT doc_id, n_tokens, n_distinct,
  CAST(floor(1e6 * stop_ratio) AS BIGINT) AS stop_ratio_e6,
  CAST(floor(1e6 * mean_len) AS BIGINT) AS mean_tok_len_e6,
  CAST(floor(1e6 * (0.5 * (1 - stop_ratio)
      + 0.3 * least(1.0, n_tokens / 50.0)
      + 0.2 * distinct_ratio)) AS BIGINT) AS quality_e6
FROM feats
"""

TOKEN_COUNTS_SQL = f"""
SELECT doc_id,
  len(string_split(text, ' ')) AS n_ws_tokens,
  len(regexp_extract_all(text, '{G.BPE_TOKEN_PATTERN}')) AS n_bpe_tokens
FROM documents
"""

DOC_FINGERPRINT_SQL = f"""
SELECT doc_id,
  list_reduce(
    list_prepend(0::BIGINT,
      list_transform(string_split(text, ' '), t -> {_TOKCODE})),
    (a, b) -> (a*31 + b) % {G.FP_MOD}) AS fingerprint
FROM documents
"""

# --- language-ID oracle (grammar.py LANGID spec, integer-exact) -------------
def _sh(a: str) -> str:
    return f"(CASE WHEN {a} BETWEEN 97 AND 122 THEN 97 + ({a} - 97 + rot) % 26 ELSE {a} END)"


_TRI_CODE = (
    f"{_sh('ascii(substr(text, i, 1))')}::BIGINT * 65536"
    f" + {_sh('ascii(substr(text, i+1, 1))')}::BIGINT * 256"
    f" + {_sh('ascii(substr(text, i+2, 1))')}::BIGINT"
)

_LANGID_CTES = f"""
d AS (
  SELECT doc_id, lang, text,
         (ascii(substr(lang, 1, 1))*31 + ascii(substr(lang, 2, 1))) % 26 AS rot
  FROM documents
),
tris AS (
  SELECT doc_id, lang,
         unnest(list_transform(generate_series(1, length(text) - 2),
                               i -> {_TRI_CODE})) AS code
  FROM d WHERE length(text) >= 3
),
counts AS (SELECT lang AS cand, code, count(*) AS cnt FROM tris GROUP BY 1, 2),
profile AS (
  SELECT cand, code, cnt FROM counts
  QUALIFY row_number() OVER (PARTITION BY cand ORDER BY cnt DESC, code ASC)
          <= {G.LANGID_TOP_N}
),
scores AS (
  SELECT t.doc_id, p.cand, CAST(sum(p.cnt) AS BIGINT) AS score
  FROM tris t JOIN profile p USING (code) GROUP BY 1, 2
),
universe AS (
  SELECT doc_id, lang, cand
  FROM documents CROSS JOIN (SELECT DISTINCT lang AS cand FROM documents)
),
lpred AS MATERIALIZED (
  SELECT doc_id, lang, cand AS predicted_lang
  FROM universe LEFT JOIN scores USING (doc_id, cand)
  QUALIFY row_number() OVER (PARTITION BY doc_id
                             ORDER BY coalesce(score, 0) DESC, cand ASC) = 1
)
"""

LANGID_SQL = f"""
WITH {_LANGID_CTES}
SELECT doc_id, lang, predicted_lang FROM lpred
"""

# --- corpus curation oracle (grammar.py policy over the composed ops) -------
_QUAL_CTE = f"""
qual AS (
  SELECT doc_id,
    CAST(floor(1e6 * (0.5 * (1 - stop_ratio)
        + 0.3 * least(1.0, n_tokens / 50.0)
        + 0.2 * distinct_ratio)) AS BIGINT) AS quality_e6
  FROM (
    SELECT doc_id, len(toks) AS n_tokens,
      len(list_filter(toks, t -> t IN ({_STOP_LIST})))::DOUBLE / len(toks)
        AS stop_ratio,
      len(list_distinct(toks))::DOUBLE / len(toks) AS distinct_ratio
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
  )
)
"""

CURATE_SQL = f"""
WITH RECURSIVE {SHINGLES_CTE}, {_CLUSTERS_CTES}, {_LANGID_CTES}, {_QUAL_CTE}
SELECT doc_id, reason, CAST(reason = 'keep' AS INT) AS keep FROM (
  SELECT documents.doc_id,
    CASE WHEN q.quality_e6 < {G.QUALITY_MIN_E6} THEN 'low_quality'
         WHEN p.predicted_lang <> p.lang THEN 'lang_mismatch'
         WHEN k.keep_doc_id IS NOT NULL AND k.keep_doc_id <> documents.doc_id
              THEN 'near_duplicate'
         ELSE 'keep' END AS reason
  FROM documents
  JOIN qual q USING (doc_id)
  JOIN lpred p USING (doc_id)
  LEFT JOIN ckeep k USING (doc_id)
)
"""

# Composed training export: the CURATE decision selects survivors,
# split+pack assignment runs over them only (pack SQL restricted by a
# semi-join on the kept set).
TRAINING_EXPORT_SQL = f"""
WITH RECURSIVE {SHINGLES_CTE}, {_CLUSTERS_CTES}, {_LANGID_CTES}, {_QUAL_CTE},
curated AS (
  SELECT documents.doc_id,
    CASE WHEN q.quality_e6 < {G.QUALITY_MIN_E6} THEN 'low_quality'
         WHEN p.predicted_lang <> p.lang THEN 'lang_mismatch'
         WHEN k.keep_doc_id IS NOT NULL AND k.keep_doc_id <> documents.doc_id
              THEN 'near_duplicate'
         ELSE 'keep' END AS reason
  FROM documents
  JOIN qual q USING (doc_id)
  JOIN lpred p USING (doc_id)
  LEFT JOIN ckeep k USING (doc_id)
),
kept AS (SELECT doc_id FROM curated WHERE reason = 'keep'),
sized AS (
  SELECT d.doc_id,
         CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
              ELSE 'test' END AS split,
         CAST((({G.hash_a(2)} * d.doc_id + {G.hash_b(2)}) % {G.HASH_P})
                % {G.PACK_SHARDS} AS INT) AS shard,
         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok
  FROM (
    SELECT doc_id, text,
           (({G.hash_a(1)} * doc_id + {G.hash_b(1)}) % {G.HASH_P}) % 100 AS b
    FROM documents
  ) d
  JOIN kept USING (doc_id)
)
SELECT doc_id, split, shard, n_tok,
       CAST(start // {G.PACK_CAPACITY} AS BIGINT) AS seq_id,
       CAST(start % {G.PACK_CAPACITY} AS BIGINT) AS seq_off
FROM (
  SELECT doc_id, split, shard, n_tok,
         sum(n_tok) OVER (PARTITION BY split, shard ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) - n_tok AS start
  FROM sized
)
"""

PREDICATE_COUNTS_SQL = f"""
{_KG_CTES}
SELECT p, count(*) AS n FROM (
  SELECT DISTINCT s, p, o FROM {_QUADS_UNION}
) GROUP BY p
"""

RELATIONAL_SQL["revenue_rollup"] = f"""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       CAST(sum({_e6('l_extendedprice * (1 - l_discount)')}) AS BIGINT) AS revenue_e6,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""

RELATIONAL_SQL["revenue_cube"] = f"""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       CAST(sum({_e6('l_extendedprice * (1 - l_discount)')}) AS BIGINT) AS revenue_e6,
       count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""

RELATIONAL_SQL["nation_intersect"] = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""

# Exact int64 interpolation mirroring queries.event_value_percentiles —
# quantile_cont's floating interpolation could differ from Spark's
# percentile() by one ulp exactly at integer grid points (round-3
# ADVICE); the quarter-unit integer formula is bit-identical by
# construction (v_e6 >= 0 so // == floor on both engines).
RELATIONAL_SQL["event_value_percentiles"] = f"""
WITH ev AS (SELECT event_type, {_e6('value')} AS v_e6 FROM events),
ranked AS (
  SELECT event_type, v_e6,
         row_number() OVER (PARTITION BY event_type ORDER BY v_e6) - 1 AS i,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM ev)
SELECT event_type,
       CAST(sum(CASE WHEN i = ((n-1)*1)//4 THEN v_e6 * (4 - ((n-1)*1)%4) WHEN i = ((n-1)*1)//4 + 1 THEN v_e6 * (((n-1)*1)%4) ELSE 0 END)//4 AS BIGINT) AS p25_e6,
       CAST(sum(CASE WHEN i = ((n-1)*2)//4 THEN v_e6 * (4 - ((n-1)*2)%4) WHEN i = ((n-1)*2)//4 + 1 THEN v_e6 * (((n-1)*2)%4) ELSE 0 END)//4 AS BIGINT) AS p50_e6,
       CAST(sum(CASE WHEN i = ((n-1)*3)//4 THEN v_e6 * (4 - ((n-1)*3)%4) WHEN i = ((n-1)*3)//4 + 1 THEN v_e6 * (((n-1)*3)%4) ELSE 0 END)//4 AS BIGINT) AS p75_e6
FROM ranked
GROUP BY event_type
"""

# The oracle states the as-of semantics as the naive ts-inequality
# join + per-purchase rank (fine at oracle scale; the Spark side is the
# union+window form that scales) — same (ts desc, id desc) tie-break.
RELATIONAL_SQL["event_asof_join"] = """
WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
           FROM events WHERE event_type IN ('click', 'purchase')),
p AS (SELECT * FROM e WHERE event_type = 'purchase'),
c AS (SELECT * FROM e WHERE event_type = 'click'),
j AS (
  SELECT p.user_id, p.event_id AS purchase_id, p.ts_us AS purchase_ts_us,
         c.event_id AS click_id, c.ts_us AS click_ts_us,
         row_number() OVER (PARTITION BY p.user_id, p.event_id
                            ORDER BY c.ts_us DESC NULLS LAST,
                                     c.event_id DESC NULLS LAST) AS rn
  FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts_us <= p.ts_us
)
SELECT user_id, purchase_id, purchase_ts_us, click_id, click_ts_us
FROM j WHERE rn = 1
"""

# Oracle = the naive inequality join the banded plan replaces.
RELATIONAL_SQL["event_range_join"] = """
WITH e AS (SELECT event_id, event_type, epoch_us(ts) AS ts_us FROM events),
err AS (SELECT event_id AS err_id, ts_us AS err_ts_us FROM e
        WHERE event_type = 'error'),
o AS (SELECT ts_us AS o_ts_us FROM e WHERE event_type != 'error'),
counts AS (
  SELECT err_id, count(*) AS n_nearby
  FROM err JOIN o ON abs(o.o_ts_us - err.err_ts_us) <= 60000000
  GROUP BY err_id
)
SELECT err.err_id, CAST(coalesce(c.n_nearby, 0) AS BIGINT) AS n_nearby
FROM err LEFT JOIN counts c USING (err_id)
"""

RELATIONAL_SQL["event_hypertable_rollup"] = f"""
WITH base AS (
  SELECT event_type, epoch_us(ts) AS ts_us, {_e6('value')} AS v_e6 FROM events
),
minute AS (
  SELECT event_type, ts_us // 60000000 AS bucket,
         count(*) AS n, CAST(sum(v_e6) AS BIGINT) AS sum_e6,
         max(v_e6) AS max_e6
  FROM base GROUP BY event_type, bucket
),
hour AS (
  SELECT event_type, bucket // 60 AS bucket,
         CAST(sum(n) AS BIGINT) AS n, CAST(sum(sum_e6) AS BIGINT) AS sum_e6,
         max(max_e6) AS max_e6
  FROM minute GROUP BY event_type, 2
),
day AS (
  SELECT event_type, bucket // 24 AS bucket,
         CAST(sum(n) AS BIGINT) AS n, CAST(sum(sum_e6) AS BIGINT) AS sum_e6,
         max(max_e6) AS max_e6
  FROM hour GROUP BY event_type, 2
)
SELECT 'minute' AS level, * FROM minute
UNION ALL SELECT 'hour', * FROM hour
UNION ALL SELECT 'day', * FROM day
"""

RELATIONAL_SQL["event_value_pivot"] = f"""
WITH t AS (SELECT event_type FROM
  (SELECT DISTINCT event_type FROM events ORDER BY event_type LIMIT 2)),
tt AS (SELECT min(event_type) AS t0, max(event_type) AS t1 FROM t)
SELECT user_id,
  CAST(sum(CASE WHEN event_type = (SELECT t0 FROM tt)
            THEN {_e6('value')} ELSE 0 END) AS BIGINT) AS v0_e6,
  CAST(sum(CASE WHEN event_type = (SELECT t1 FROM tt)
            THEN {_e6('value')} ELSE 0 END) AS BIGINT) AS v1_e6
FROM events GROUP BY user_id
"""

RELATIONAL_SQL["event_sessions"] = """
SELECT user_id, event_id,
       CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
FROM (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id)) > 30*60*1000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events)
"""


# r5: SPARQL sequence path ?d ex:mentions/^owl:sameAs/rdfs:label ?l —
# the path's fresh-variable translation as an explicit join chain; the
# inverse step joins on the sameAs OBJECT.
SPARQL_PATH_SEQ_SQL = f"""
{_KG_CTES},
tri AS (SELECT DISTINCT s, p, o FROM {_QUADS_UNION})
SELECT DISTINCT m.s AS d, l.o AS l
FROM tri m
JOIN tri sa ON sa.o = m.o AND sa.p = 'owl:sameAs'
JOIN tri l ON l.s = sa.s AND l.p = 'rdfs:label'
WHERE m.p = 'ex:mentions'
"""

# r5: SPARQL zero-or-more path ?x owl:sameAs* ?y = directed recursive
# closure ∪ the zero-length identity over every graph term.
SPARQL_PATH_STAR_SQL = f"""
{_KG_CTES},
tri AS (SELECT DISTINCT s, p, o FROM {_QUADS_UNION}),
sa_dir AS (SELECT s AS a, o AS b FROM tri WHERE p = 'owl:sameAs'),
sa_reach AS (
  SELECT a, b FROM sa_dir
  UNION
  SELECT r.a, e.b FROM sa_reach r JOIN sa_dir e ON e.a = r.b
),
terms AS (SELECT s AS t FROM tri UNION SELECT o FROM tri),
star AS (
  SELECT a, b FROM sa_reach
  UNION
  SELECT t AS a, t AS b FROM terms
)
SELECT DISTINCT c.s AS x, st.b AS y
FROM tri c
JOIN star st ON st.a = c.s
JOIN tri sc ON sc.s = st.b AND sc.p = 'ex:score'
WHERE c.p = 'rdf:type' AND c.o = 'ex:Commerce'
"""

# r5: SPARQL subquery — the aggregate computed once, joined back on
# the shared variable, outer FILTER over the subquery-bound count.
SPARQL_SUBQUERY_SQL = f"""
{_KG_CTES},
tri AS (SELECT DISTINCT s, p, o FROM {_QUADS_UNION}),
cls_counts AS (
  SELECT o AS t, COUNT(*) AS n FROM tri WHERE p = 'rdf:type' GROUP BY o
)
SELECT DISTINCT t1.s AS e, t1.o AS t
FROM tri t1 JOIN cls_counts c ON c.t = t1.o
WHERE t1.p = 'rdf:type' AND c.n >= 100
"""

# r5: nested-group UNION joined with a further pattern.
SPARQL_UNION_NESTED_SQL = f"""
{_KG_CTES},
tri AS (SELECT DISTINCT s, p, o FROM {_QUADS_UNION})
SELECT DISTINCT ty.s AS e, ty.o AS t, u.v
FROM (
  SELECT s, o AS v FROM tri WHERE p = 'rdfs:label'
  UNION ALL
  SELECT s, o AS v FROM tri WHERE p = 'dc:language'
) u JOIN tri ty ON ty.s = u.s AND ty.p = 'rdf:type'
"""

# r5: SPARQL AVG = exact-BIGINT SUM / COUNT divided in DOUBLE — the
# same two exact integers divide on both engines (IEEE-identical
# quotient), then the standard floor(1e6·x) BIGINT bridge.
SPARQL_AVG_SQL = f"""
{_KG_CTES},
tri AS (SELECT DISTINCT s, p, o FROM {_QUADS_UNION})
SELECT t1.o AS t,
       CAST(floor(1e6 * (CAST(SUM(CAST(t2.o AS BIGINT)) AS DOUBLE)
                         / COUNT(t2.o))) AS BIGINT) AS avg_e6
FROM tri t1 JOIN tri t2 ON t2.s = t1.s AND t2.p = 'ex:score'
WHERE t1.p = 'rdf:type'
GROUP BY t1.o
"""


# r5: OPTIONAL body FILTER + COALESCE — the filter applies INSIDE the
# left join's right side (SPARQL), not over the joined result.
SPARQL_OPTIONAL_FILTER_SQL = f"""
{_KG_CTES},
tri AS (SELECT DISTINCT s, p, o FROM {_QUADS_UNION})
SELECT DISTINCT t1.s AS e, COALESCE(sc.o, 'none') AS sc
FROM tri t1
LEFT JOIN (
  SELECT s, o FROM tri WHERE p = 'ex:score' AND CAST(o AS INT) >= 3
) sc ON sc.s = t1.s
WHERE t1.p = 'rdf:type' AND t1.o = 'ex:Commerce'
"""


# r5: GROUP_CONCAT (sorted, '|' separator) + SAMPLE (= MIN).
SPARQL_GROUP_CONCAT_SQL = f"""
{_KG_CTES},
tri AS (SELECT DISTINCT s, p, o FROM {_QUADS_UNION})
SELECT t1.s AS e,
       string_agg(t2.o, '|' ORDER BY t2.o) AS scores,
       min(t2.o) AS one
FROM tri t1 JOIN tri t2 ON t2.s = t1.s AND t2.p = 'ex:score'
WHERE t1.p = 'rdf:type' AND t1.o = 'ex:Commerce'
GROUP BY t1.s
"""


# r5: train/eval contamination — shared-3-gram-code counts vs the
# eval-corpus code union, 0 kept for clean documents.
CONTAMINATION_SQL = f"""
WITH {SHINGLES_CTE},
ev AS (
  SELECT DISTINCT unnest(shingles) AS code
  FROM shingled WHERE doc_id % 97 = 0
),
tr AS (
  SELECT doc_id, unnest(shingles) AS code
  FROM shingled WHERE doc_id % 97 <> 0
),
sh AS (
  SELECT tr.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM tr JOIN ev USING (code) GROUP BY tr.doc_id
)
SELECT t.doc_id,
       COALESCE(sh.n_shared, 0) AS n_shared,
       COALESCE(sh.n_shared, 0) >= 8 AS flagged
FROM (SELECT doc_id FROM shingled WHERE doc_id % 97 <> 0) t
LEFT JOIN sh USING (doc_id)
"""


# r5: integer-exact PageRank over the co-occurrence graph — the same
# five iterations unrolled as CTEs ('//' = DuckDB integer division;
# BIGINT sums are order-independent, so both engines agree bit-exactly).
_PR_ITER = """,
pr{k} AS (
  SELECT n.entity_id,
         CAST(150000 + (17 * COALESCE(inc.s, 0)) // 20 AS BIGINT) AS score
  FROM pr_nodes n LEFT JOIN (
    SELECT e.dst AS entity_id, SUM(p.score // d.d) AS s
    FROM pr_edges e
    JOIN pr{km1} p ON p.entity_id = e.src
    JOIN pr_deg d ON d.src = e.src
    GROUP BY e.dst
  ) inc USING (entity_id)
)"""

ENTITY_PAGERANK_SQL = (
    f"""{_KG_CTES},
doc_ents AS (
  SELECT DISTINCT mm.doc_id, e.entity_id
  FROM mm JOIN eids e ON e.label = mm.root
),
coocc AS (
  SELECT a.entity_id AS entity_a, b.entity_id AS entity_b
  FROM doc_ents a JOIN doc_ents b
    ON b.doc_id = a.doc_id AND a.entity_id < b.entity_id
  GROUP BY 1, 2
),
pr_edges AS MATERIALIZED (
  SELECT entity_a AS src, entity_b AS dst FROM coocc
  UNION ALL
  SELECT entity_b AS src, entity_a AS dst FROM coocc
),
pr_deg AS MATERIALIZED (
  SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM pr_edges GROUP BY src
),
pr_nodes AS MATERIALIZED (SELECT DISTINCT entity_id FROM eids),
pr0 AS (SELECT entity_id, CAST(1000000 AS BIGINT) AS score FROM pr_nodes)"""
    + "".join(_PR_ITER.format(k=k, km1=k - 1) for k in range(1, 6))
    + """
SELECT entity_id, score FROM pr5
"""
)


# r5: per-entity triangle counts over the ordered co-occurrence edges.
ENTITY_TRIANGLES_SQL = f"""
{_KG_CTES},
doc_ents AS (
  SELECT DISTINCT mm.doc_id, e.entity_id
  FROM mm JOIN eids e ON e.label = mm.root
),
coocc AS MATERIALIZED (
  SELECT a.entity_id AS entity_a, b.entity_id AS entity_b
  FROM doc_ents a JOIN doc_ents b
    ON b.doc_id = a.doc_id AND a.entity_id < b.entity_id
  GROUP BY 1, 2
),
tri AS MATERIALIZED (
  SELECT ab.entity_a AS a, ab.entity_b AS b, bc.entity_b AS c
  FROM coocc ab
  JOIN coocc bc ON bc.entity_a = ab.entity_b
  JOIN coocc ac ON ac.entity_a = ab.entity_a AND ac.entity_b = bc.entity_b
)
SELECT entity_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM (
  SELECT a AS entity_id FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
GROUP BY entity_id
"""


# r6: common-neighbor link prediction — wedges over the bidirectional
# edge frame, existing edges anti-joined away, cn >= 2 threshold.
ENTITY_LINK_PRED_SQL = f"""
{_KG_CTES},
doc_ents AS (
  SELECT DISTINCT mm.doc_id, e.entity_id
  FROM mm JOIN eids e ON e.label = mm.root
),
coocc AS MATERIALIZED (
  SELECT a.entity_id AS entity_a, b.entity_id AS entity_b
  FROM doc_ents a JOIN doc_ents b
    ON b.doc_id = a.doc_id AND a.entity_id < b.entity_id
  GROUP BY 1, 2
),
bi_all AS MATERIALIZED (
  SELECT entity_a AS src, entity_b AS dst FROM coocc
  UNION ALL
  SELECT entity_b AS src, entity_a AS dst FROM coocc
),
bi AS MATERIALIZED (
  SELECT src, dst FROM bi_all
  WHERE src IN (SELECT src FROM bi_all GROUP BY src
                HAVING count(*) <= 64)
),
lp_cand AS (
  SELECT w1.dst AS a, w2.dst AS b, CAST(count(*) AS BIGINT) AS cn
  FROM bi w1 JOIN bi w2 ON w2.src = w1.src AND w1.dst < w2.dst
  GROUP BY 1, 2 HAVING count(*) >= 2
)
SELECT c.a AS entity_a, c.b AS entity_b, c.cn
FROM lp_cand c LEFT JOIN coocc e
  ON e.entity_a = c.a AND e.entity_b = c.b
WHERE e.entity_a IS NULL
"""


# r6: int8 scalar quantization on the integer e3 grid — identical
# arithmetic to the Spark builder; all-positive DIV operands keep
# truncating vs floor division equivalent.
EMBEDDING_QUANTIZE_SQL = """
WITH v AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(1000 * CAST(x AS DOUBLE)) AS BIGINT)) AS xe3
  FROM embeddings
),
m AS (
  SELECT vec_id, xe3,
         list_max(list_transform(xe3, v -> abs(v))) AS maxabs
  FROM v
),
q AS (
  SELECT vec_id, xe3, maxabs,
         list_transform(xe3,
           v -> CASE WHEN maxabs = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST((CASE WHEN v >= 0 THEN 1 ELSE -1 END)
                     * ((254 * abs(v) + maxabs) // (2 * maxabs))
                     AS BIGINT) END) AS qc
  FROM m
)
SELECT vec_id,
       maxabs AS maxabs_e3,
       CAST((1000000 * CAST(list_sum(list_transform(
              generate_series(1, len(xe3)),
              i -> abs(127 * xe3[i] - qc[i] * maxabs))) AS BIGINT))
            // (127 * len(xe3) * 1000) AS BIGINT) AS mean_abs_err_e6,
       CAST(list_sum(list_transform(generate_series(1, len(qc)),
              i -> qc[i] * i)) AS BIGINT) AS q_checksum
FROM q
"""


# r6b: graph analytics over the same co-occurrence edge frame the
# pagerank/triangles oracles build.
_GRAPH_EDGE_CTES = f"""{_KG_CTES},
doc_ents AS (
  SELECT DISTINCT mm.doc_id, e.entity_id
  FROM mm JOIN eids e ON e.label = mm.root
),
coocc AS (
  SELECT a.entity_id AS entity_a, b.entity_id AS entity_b
  FROM doc_ents a JOIN doc_ents b
    ON b.doc_id = a.doc_id AND a.entity_id < b.entity_id
  GROUP BY 1, 2
),
pr_edges AS MATERIALIZED (
  SELECT entity_a AS src, entity_b AS dst FROM coocc
  UNION ALL
  SELECT entity_b AS src, entity_a AS dst FROM coocc
),
pr_nodes AS MATERIALIZED (SELECT DISTINCT entity_id FROM eids)"""

_KC_ITER = """,
kc{k} AS MATERIALIZED (
  SELECT e.src AS entity_id FROM pr_edges e
  JOIN kc{km1} a ON a.entity_id = e.src
  JOIN kc{km1} b ON b.entity_id = e.dst
  GROUP BY e.src HAVING count(*) >= 3
)"""

# 8 unrolled peeling rounds ≥ the fixture's convergence depth (5 at
# sf0.01); the Spark side peels to the fixpoint, which coincides.
ENTITY_KCORE_SQL = (
    _GRAPH_EDGE_CTES
    + ",\nkc0 AS MATERIALIZED (SELECT entity_id FROM pr_nodes)"
    + "".join(_KC_ITER.format(k=k, km1=k - 1) for k in range(1, 9))
    + """
SELECT entity_id FROM kc8 ORDER BY entity_id
"""
)

_LP_ITER = """,
lp{k} AS MATERIALIZED (
  SELECT p.entity_id, coalesce(w.label, p.label) AS label
  FROM lp{km1} p
  LEFT JOIN (
    SELECT entity_id, label FROM (
      SELECT e.src AS entity_id, l.label,
             row_number() OVER (PARTITION BY e.src
                                ORDER BY count(*) DESC, l.label) AS rn
      FROM pr_edges e JOIN lp{km1} l ON l.entity_id = e.dst
      GROUP BY e.src, l.label
    ) WHERE rn = 1
  ) w ON w.entity_id = p.entity_id
)"""

# 4 fixed synchronous rounds — part of the operator definition.
ENTITY_COMMUNITIES_SQL = (
    _GRAPH_EDGE_CTES
    + ",\nlp0 AS MATERIALIZED "
    + "(SELECT entity_id, entity_id AS label FROM pr_nodes)"
    + "".join(_LP_ITER.format(k=k, km1=k - 1) for k in range(1, 5))
    + """
SELECT entity_id, label FROM lp4 ORDER BY entity_id
"""
)


# r5: training_export with the contamination gate spliced into the
# kept set (same composed-oracle pattern; eval docs and ≥8-shared-code
# documents drop before split+pack).
TRAINING_EXPORT_CLEAN_SQL = TRAINING_EXPORT_SQL.replace(
    "kept AS (SELECT doc_id FROM curated WHERE reason = 'keep'),",
    """kept0 AS (SELECT doc_id FROM curated WHERE reason = 'keep'),
ct_ev AS (
  SELECT DISTINCT unnest(shingles) AS code
  FROM shingled WHERE doc_id % 97 = 0
),
ct_sh AS (
  SELECT tr.doc_id, COUNT(*) AS n_shared
  FROM (SELECT doc_id, unnest(shingles) AS code
        FROM shingled WHERE doc_id % 97 <> 0) tr
  JOIN ct_ev USING (code) GROUP BY tr.doc_id
),
kept AS (
  SELECT k.doc_id FROM kept0 k
  LEFT JOIN ct_sh USING (doc_id)
  WHERE k.doc_id % 97 <> 0 AND COALESCE(ct_sh.n_shared, 0) < 8
),""",
)
assert TRAINING_EXPORT_CLEAN_SQL != TRAINING_EXPORT_SQL


# r5: balanced quota sample — k lowest-hash docs per (lang, source).
DOC_QUOTA_SAMPLE_SQL = f"""
SELECT doc_id, lang, source, CAST(rn AS INT) AS rn
FROM (
  SELECT doc_id, lang, source,
         row_number() OVER (
           PARTITION BY lang, source
           ORDER BY ({G.hash_a(3)} * doc_id + {G.hash_b(3)}) % {G.HASH_P},
                    doc_id
         ) AS rn
  FROM documents
)
WHERE rn <= 10
"""


# r5: per-source near-dup drop rate (pipeline observability).
DEDUP_RATE_BY_SOURCE_SQL = f"""
WITH RECURSIVE {SHINGLES_CTE}, {_CLUSTERS_CTES}
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN k.keep_doc_id IS NOT NULL
                      AND k.keep_doc_id <> d.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dropped,
       CAST(floor(1e6 * SUM(CASE WHEN k.keep_doc_id IS NOT NULL
                                  AND k.keep_doc_id <> d.doc_id
                                 THEN 1 ELSE 0 END)::DOUBLE
                  / COUNT(*)) AS BIGINT) AS drop_rate_e6
FROM documents d LEFT JOIN ckeep k USING (doc_id)
GROUP BY d.source
"""
# r6: SPARQL UPDATE end-state — pre-state (nation → per-region graphs)
# minus CLEAR ex:reg0, minus DELETE WHERE o='CHINA', minus the ground
# DELETE DATA row, plus the two INSERT DATA rows.
KG_SPARQL_UPDATE_SQL = """
WITH base AS (
  SELECT 'ex:reg' || CAST(n_regionkey AS VARCHAR) AS g,
         'ex:nat' || CAST(n_nationkey AS VARCHAR) AS s,
         'ex:name' AS p,
         n_name AS o
  FROM nation
),
survivors AS (
  SELECT * FROM base
  WHERE g <> 'ex:reg0'
    AND NOT (p = 'ex:name' AND o = 'CHINA')
    AND NOT (g = 'ex:reg1' AND s = 'ex:nat1'
             AND p = 'ex:name' AND o = 'ARGENTINA')
)
SELECT g, s, p, o FROM survivors
UNION ALL SELECT 'urn:x-kgspark:default', 'ex:extra', 'ex:name', 'ATLANTIS'
UNION ALL SELECT 'ex:reg9', 'ex:nat99', 'ex:flag', 'ex:new'
"""

# r6: PII curation — the augmentation string, redaction chain and
# per-rule counts are COMPOSED from grammar.PII_RULES so both engines
# share one spec (sequential replace order included).  DuckDB
# regexp_replace needs the explicit 'g' flag (Spark is global by
# default).
_PII_AUG = (
    "(CASE WHEN doc_id % 3 <> 0 THEN text"
    " || ' contact u' || CAST(doc_id AS VARCHAR)"
    " || '@ex' || CAST(doc_id % 7 AS VARCHAR)"
    " || '.com call 555-'"
    " || lpad(CAST((doc_id*37) % 10000 AS VARCHAR), 4, '0')"
    " || ' ref ' || CAST(doc_id*13 + 10000000 AS VARCHAR)"
    " ELSE text END)"
)


def _pii_scrub_expr(src: str) -> str:
    out = src
    for _kind, pat, repl in G.PII_RULES:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


def _pii_count_cols(src: str) -> str:
    return ", ".join(
        f"CAST(len(regexp_extract_all({src}, '{pat}')) AS BIGINT)"
        f" AS n_{kind}"
        for kind, pat, _repl in G.PII_RULES
    )


PII_SCRUB_SQL = f"""
SELECT doc_id,
       {_pii_scrub_expr(_PII_AUG)} AS clean_text,
       {_pii_count_cols(_PII_AUG)},
       CAST({' + '.join(f"len(regexp_extract_all({_PII_AUG}, '{p}'))"
                        for _k, p, _r in G.PII_RULES)} AS BIGINT) AS n_pii
FROM documents
"""

PII_RATE_BY_SOURCE_SQL = f"""
WITH scrubbed AS (
  SELECT source,
         {' + '.join(f"len(regexp_extract_all({_PII_AUG}, '{p}'))"
                     for _k, p, _r in G.PII_RULES)} AS n_pii
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_pii > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_pii,
       CAST(SUM(n_pii) AS BIGINT) AS n_redactions,
       CAST(floor(1e6 * SUM(CASE WHEN n_pii > 0 THEN 1 ELSE 0 END)::DOUBLE
                  / COUNT(*)) AS BIGINT) AS pii_rate_e6
FROM scrubbed
GROUP BY source
"""

# r6: paragraph-granularity near-dup (boilerplate) — paragraphs are
# PARA_TOKENS-token windows keyed doc_id·PARA_KEY_MUL + para_id, then
# the exact minhash-LSH chain runs over the paragraph table.
_PARA_CTES = f"""
dtokp AS (
  SELECT doc_id, lang, source, string_split(text, ' ') AS toks
  FROM documents
),
pidx AS (
  SELECT doc_id, lang, source, toks,
         unnest(generate_series(
           1, greatest(CAST(ceil(len(toks) / {G.PARA_TOKENS}.0) AS BIGINT), 1)
         )) AS i
  FROM dtokp
),
paras AS (
  SELECT doc_id * {G.PARA_KEY_MUL} + (i - 1) AS doc_id, lang, source,
         array_to_string(
           list_slice(toks, (i-1)*{G.PARA_TOKENS} + 1,
                      (i-1)*{G.PARA_TOKENS} + {G.PARA_TOKENS}), ' ') AS text
  FROM pidx
)
"""

PARA_DEDUP_SQL = f"""
WITH {_PARA_CTES},
dtok AS (
  SELECT doc_id, lang, source, string_split(text, ' ') AS toks FROM paras
),
shingled AS (
  SELECT doc_id, lang, source,
    list_distinct(list_transform(
      generate_series(1, greatest(len(toks) - 2, 1)),
      i -> (({_TC_NULL.format(t='toks[i]')} * 31
             + {_TC_NULL.format(t='toks[i+1]')}) * 31
             + {_TC_NULL.format(t='toks[i+2]')}) % {G.FP_MOD}
    )) AS shingles
  FROM dtok
),
perms(i, a, b) AS (VALUES {_PERMS_ROWS}),
codes AS (SELECT doc_id, unnest(shingles) AS code FROM shingled),
sig AS (
  SELECT doc_id, i, min((a * code + b) % {G.HASH_P}) AS mh
  FROM codes CROSS JOIN perms GROUP BY doc_id, i
),
bands AS (
  SELECT doc_id, CAST(i // {G.LSH_ROWS} AS INT) AS band_id,
         max(CASE WHEN i % {G.LSH_ROWS} = 0 THEN mh END) * {G.HASH_P}
           + max(CASE WHEN i % {G.LSH_ROWS} = 1 THEN mh END) AS band_hash
  FROM sig GROUP BY doc_id, CAST(i // {G.LSH_ROWS} AS INT)
),
cand AS (
  SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
  FROM bands a JOIN bands c
    ON a.band_id = c.band_id AND a.band_hash = c.band_hash
   AND a.doc_id < c.doc_id
  WHERE a.doc_id // {G.PARA_KEY_MUL} <> c.doc_id // {G.PARA_KEY_MUL}
  GROUP BY 1, 2
)
SELECT CAST(cand.doc_a // {G.PARA_KEY_MUL} AS BIGINT) AS doc_a,
       CAST(cand.doc_a % {G.PARA_KEY_MUL} AS BIGINT) AS para_a,
       CAST(cand.doc_b // {G.PARA_KEY_MUL} AS BIGINT) AS doc_b,
       CAST(cand.doc_b % {G.PARA_KEY_MUL} AS BIGINT) AS para_b,
       CAST(floor(1e6 * (len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
         / (len(sa.shingles) + len(sb.shingles)
            - len(list_intersect(sa.shingles, sb.shingles))))) AS BIGINT)
         AS jaccard_e6
FROM cand
JOIN shingled sa ON sa.doc_id = cand.doc_a
JOIN shingled sb ON sb.doc_id = cand.doc_b
"""

# r6: SELECT projection expressions + ORDER BY expression keys.
SPARQL_SELECT_EXPR_SQL = f"""
{_KG_CTES},
tri AS (SELECT DISTINCT s, p, o FROM {_QUADS_UNION})
SELECT t1.s AS e, t1.o AS l,
       CAST(length(t1.o) AS INT) AS len,
       CAST(t2.o AS INT) * 2 AS n2
FROM tri t1
JOIN tri t2 ON t2.s = t1.s AND t2.p = 'ex:score'
WHERE t1.p = 'rdfs:label'
ORDER BY length(t1.o) DESC, e, l, CAST(t2.o AS INT) LIMIT 30
"""

# r6: EXISTS with an OPTIONAL-unbound shared variable (compatible-
# solution semantics): unbound ?y is compatible with anything, so the
# row survives iff the EXISTS group is non-empty at all; bound ?y must
# itself match.
SPARQL_OPTIONAL_EXISTS_SQL = f"""
{_KG_CTES},
tri AS (SELECT DISTINCT s, p, o FROM {_QUADS_UNION}),
base AS (
  SELECT c.s AS x, lb.o AS l
  FROM tri c
  LEFT JOIN tri lb ON lb.s = c.s AND lb.p = 'rdfs:label'
                  AND lb.o LIKE 'c%'
  WHERE c.p = 'rdf:type' AND c.o = 'ex:Commerce'
)
SELECT x, l FROM base
WHERE (l IS NOT NULL AND EXISTS (
         SELECT 1 FROM tri w WHERE w.p = 'rdfs:label' AND w.o = base.l))
   OR (l IS NULL AND EXISTS (SELECT 1 FROM tri w WHERE w.p = 'rdfs:label'))
"""

# r6: expanded scalar-builtin surface — nested CONCAT/UCASE/SUBSTR,
# IF, STRLEN, MD5, ABS/FLOOR over integer casts; total ORDER BY before
# the LIMIT cut.
SPARQL_BUILTINS_SQL = f"""
{_KG_CTES},
tri AS (SELECT DISTINCT s, p, o FROM {_QUADS_UNION})
SELECT t1.s AS e, t1.o AS l,
       upper(substring(t1.o, 1, 1)) || substring(t1.o, 2) AS cap,
       CASE WHEN length(t1.o) >= 6 THEN 'long' ELSE 'short' END AS sz,
       md5(t1.o) AS h,
       CAST(abs(CAST(t2.o AS INT) - 50) AS INT) AS dist,
       CAST(floor(CAST(t2.o AS INT) / 7) AS BIGINT) AS bucket
FROM tri t1
JOIN tri t2 ON t2.s = t1.s AND t2.p = 'ex:score'
WHERE t1.p = 'rdfs:label'
ORDER BY e, l, CAST(t2.o AS INT) LIMIT 40
"""

# r6: term-inspection builtins — isIRI via the term kind, LANGMATCHES
# basic range 'en' (case-insensitive exact or en-*).
SPARQL_TERM_FNS_SQL = f"""
{_KG_CTES},
trif AS (SELECT DISTINCT s, p, o, o_kind, o_lang, o_datatype
         FROM {_QUADS_UNION})
SELECT p, CAST(count(*) AS BIGINT) AS n
FROM trif
WHERE o_kind = 'iri'
   OR lower(coalesce(o_lang, '')) = 'en'
   OR lower(coalesce(o_lang, '')) LIKE 'en-%'
GROUP BY p ORDER BY p
"""

# r6: CONSTRUCT WHERE shorthand — the BGP doubles as the template;
# distinct union of both pattern instantiations.
SPARQL_CONSTRUCT_WHERE_SQL = f"""
{_KG_CTES},
tri AS (SELECT DISTINCT s, p, o FROM {_QUADS_UNION}),
sol AS (SELECT t1.s AS e, t1.o AS l, t2.o AS n
        FROM tri t1
        JOIN tri t2 ON t2.s = t1.s AND t2.p = 'ex:score'
        WHERE t1.p = 'rdfs:label')
SELECT DISTINCT s, p, o FROM (
  SELECT e AS s, 'rdfs:label' AS p, l AS o FROM sol
  UNION ALL
  SELECT e AS s, 'ex:score' AS p, n AS o FROM sol
)
"""

# r6b: Gopher-style repetition metrics — two-level (doc, term) then
# (doc) aggregates per granularity, e6 fixed-point, grammar-threshold
# flag.  Identical IEEE op order to the Spark side (1e6*num then /den).
DOC_REPETITION_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
),
tc AS (SELECT doc_id, t, count(*) c FROM tok GROUP BY 1, 2),
td AS (
  SELECT doc_id, sum(c) n, max(c) topc, count(*) ntypes FROM tc GROUP BY 1
),
bl AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ts)),
                               i -> ts[i] || ' ' || ts[i + 1])) AS b
  FROM bl WHERE len(ts) >= 2
),
bc AS (SELECT doc_id, b, count(*) c FROM bg GROUP BY 1, 2),
bd AS (
  SELECT doc_id, sum(c) nb, max(c) topb, count(*) nbtypes FROM bc GROUP BY 1
)
SELECT td.doc_id,
       CAST(td.n AS BIGINT) AS n_tokens,
       CAST(floor(1e6 * td.topc / td.n) AS BIGINT) AS top_token_e6,
       CAST(floor(1e6 * (td.n - td.ntypes) / td.n) AS BIGINT) AS dup_token_e6,
       CAST(coalesce(floor(1e6 * bd.topb / bd.nb), 0) AS BIGINT)
         AS top_bigram_e6,
       CAST(coalesce(floor(1e6 * (bd.nb - bd.nbtypes) / bd.nb), 0) AS BIGINT)
         AS dup_bigram_e6,
       (CAST(floor(1e6 * td.topc / td.n) AS BIGINT) > {G.REP_TOP_TOKEN_E6}
        OR CAST(coalesce(floor(1e6 * (bd.nb - bd.nbtypes) / bd.nb), 0)
                AS BIGINT) > {G.REP_DUP_BIGRAM_E6}) AS rep_flagged
FROM td LEFT JOIN bd ON bd.doc_id = td.doc_id
ORDER BY td.doc_id
"""

# r6b: corpus-level exact paragraph dedup — BOILER_TEXT prepended for
# doc_id % 3 != 1, PARA_TOKENS windows, >= LINE_DUP_MIN_DOCS distinct
# docs = boilerplate.
BOILERPLATE_RATE_SQL = f"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 != 1
              THEN '{G.BOILER_TEXT} ' || text ELSE text END AS text
  FROM documents
),
dtokp AS (SELECT doc_id, string_split(text, ' ') AS toks FROM aug),
pidx AS (
  SELECT doc_id, toks,
         unnest(generate_series(
           1, greatest(CAST(ceil(len(toks) / {G.PARA_TOKENS}.0) AS BIGINT), 1)
         )) AS i
  FROM dtokp
),
paras AS (
  SELECT doc_id, i - 1 AS para_id,
         array_to_string(
           list_slice(toks, (i - 1) * {G.PARA_TOKENS} + 1,
                      (i - 1) * {G.PARA_TOKENS} + {G.PARA_TOKENS}), ' ')
           AS text
  FROM pidx
),
counts AS (SELECT text, count(DISTINCT doc_id) AS ndocs FROM paras GROUP BY 1),
flagged AS (
  SELECT p.doc_id,
         CASE WHEN c.ndocs >= {G.LINE_DUP_MIN_DOCS} THEN 1 ELSE 0 END AS dup
  FROM paras p JOIN counts c ON c.text = p.text
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_paras,
       CAST(sum(dup) AS BIGINT) AS n_boiler,
       CAST(floor(1e6 * sum(dup) / count(*)) AS BIGINT) AS boiler_rate_e6
FROM flagged GROUP BY doc_id ORDER BY doc_id
"""

# r6: LOAD end state — the seed quad plus the nation table routed into
# ex:loaded through the N-Triples serialize→LOAD roundtrip.
KG_SPARQL_LOAD_SQL = """
SELECT g, s, p, o FROM (
  SELECT 'ex:loaded' AS g,
         'ex:nat' || CAST(n_nationkey AS VARCHAR) AS s,
         'ex:name' AS p, n_name AS o
  FROM nation
  UNION ALL
  SELECT 'urn:x-kgspark:default', 'ex:seed', 'ex:p', 'ex:q'
) ORDER BY g, s, p, o
"""

# r6: modify-form end state — WHERE over the merged graph, DELETE
# scoped to ex:reg1, INSERT of the lower-cased name into ex:reg1 for
# every solution.
KG_SPARQL_MODIFY_SQL = """
WITH base AS (
  SELECT 'ex:reg' || CAST(n_regionkey AS VARCHAR) AS g,
         'ex:nat' || CAST(n_nationkey AS VARCHAR) AS s,
         'ex:name' AS p,
         n_name AS o
  FROM nation
),
sol AS (SELECT s, o, lower(o) AS u FROM base WHERE o LIKE 'C%'),
kept AS (
  SELECT b.* FROM base b
  WHERE NOT (b.g = 'ex:reg1' AND b.p = 'ex:name'
             AND EXISTS (SELECT 1 FROM sol
                         WHERE sol.s = b.s AND sol.o = b.o))
)
SELECT g, s, p, o FROM kept
UNION
SELECT 'ex:reg1', s, 'ex:lname', u FROM sol
"""

# kg_sparql_from — dataset clauses: default graph = RDF merge of the
# FROM graphs (regions 1+2, g coalesced to ''), GRAPH branch = exactly
# the FROM NAMED set (region 3); SPARQL UNION is bag union.
KG_SPARQL_FROM_SQL = """
WITH quads AS (
  SELECT 'ex:reg' || CAST(n_regionkey AS VARCHAR) AS g,
         'ex:nat' || CAST(n_nationkey AS VARCHAR) AS s,
         n_name AS o
  FROM nation
)
SELECT '' AS g, s, o FROM (
  SELECT DISTINCT s, o FROM quads WHERE g IN ('ex:reg1', 'ex:reg2')
)
UNION ALL
SELECT g, s, o FROM quads WHERE g = 'ex:reg3'
"""


# r6: multi-source BFS hop distance — 4 unrolled rounds (same fixed
# horizon as cc.bfs_hops); seeds = entity_id % 17 == 0.
_BFS_ITER = """,
bf{k} AS MATERIALIZED (
  SELECT e.dst AS entity_id, {k} AS dist
  FROM pr_edges e JOIN bf{km1} f ON f.entity_id = e.src
  WHERE e.dst NOT IN (SELECT entity_id FROM st{km1})
  GROUP BY e.dst
),
st{k} AS MATERIALIZED (
  SELECT entity_id FROM st{km1} UNION ALL SELECT entity_id FROM bf{k}
)"""

ENTITY_HOPS_SQL = (
    _GRAPH_EDGE_CTES
    + """,
bf0 AS MATERIALIZED (
  SELECT entity_id, 0 AS dist FROM pr_nodes
  WHERE substring(entity_id, 13, 1) IN ('0', '1')
),
st0 AS (SELECT entity_id FROM bf0)"""
    + "".join(_BFS_ITER.format(k=k, km1=k - 1) for k in range(1, 5))
    + """
SELECT entity_id, CAST(dist AS INT) AS dist FROM (
  SELECT * FROM bf0 UNION ALL SELECT * FROM bf1 UNION ALL
  SELECT * FROM bf2 UNION ALL SELECT * FROM bf3 UNION ALL
  SELECT * FROM bf4
)
"""
)


# r6: deterministic source-weighted resampling — one row per emitted
# copy; weights {0.5, 1, 1.5, 2}× by srcnum % 4, fractional copy via
# the grammar affine hash (index 200).
DOC_RESAMPLE_SQL = f"""
WITH base AS (
  SELECT doc_id, source,
         500000 + (CAST(substring(source, 4) AS BIGINT) % 4) * 500000 AS w_e6,
         (({G.hash_a(200)} * doc_id + {G.hash_b(200)}) % {G.HASH_P})
           % 1000000 AS h
  FROM documents
),
counted AS (
  SELECT doc_id, source, w_e6,
         w_e6 // 1000000
           + CASE WHEN h < w_e6 % 1000000 THEN 1 ELSE 0 END AS n_copies
  FROM base
)
SELECT doc_id, source, CAST(w_e6 AS BIGINT) AS weight_e6,
       CAST(copy_id AS INT) AS copy_id
FROM (
  SELECT doc_id, source, w_e6,
         unnest(range(1, CAST(n_copies AS BIGINT) + 1)) AS copy_id
  FROM counted
)
"""


# r6: integer-exact bigram surprisal (perplexity proxy) — bitlen of
# prefix/bigram count ratio, exact integer mean ×1e6.
DOC_BIGRAM_SURPRISAL_SQL = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS toks
  FROM documents
),
bi AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM (
    SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
    FROM toks WHERE len(toks) >= 2
  )
),
db AS (SELECT doc_id, w1, w2, count(*) AS tf FROM bi GROUP BY 1, 2, 3),
bc AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS bt FROM db GROUP BY 1, 2),
uc AS (SELECT w1, CAST(sum(bt) AS BIGINT) AS ut FROM bc GROUP BY 1),
sc AS (
  SELECT db.doc_id, db.tf,
         db.tf * length(bin(CAST(uc.ut // bc.bt AS BIGINT))) AS s
  FROM db JOIN bc USING (w1, w2) JOIN uc USING (w1)
)
SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
       CAST(sum(s) AS BIGINT) AS surprisal,
       CAST((1000000 * sum(s)) // sum(tf) AS BIGINT) AS avg_surprisal_e6
FROM sc GROUP BY doc_id
"""


# r6: overlapping token-window chunking — 16-token chunks, stride 12.
DOC_CHUNK_SQL = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS toks
  FROM documents
),
nn AS (
  SELECT doc_id, toks, len(toks) AS n FROM toks WHERE len(toks) >= 1
),
ch AS (
  SELECT doc_id, toks,
         unnest(range(0, 1 + CASE WHEN n <= 16 THEN 0
                               ELSE (n - 16 + 11) // 12 END)) AS chunk_id
  FROM nn
)
SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
       CAST(chunk_id * 12 + 1 AS INT) AS start_tok,
       CAST(len(list_slice(toks, chunk_id * 12 + 1, chunk_id * 12 + 16))
            AS INT) AS n_tok,
       array_to_string(
         list_slice(toks, chunk_id * 12 + 1, chunk_id * 12 + 16), ' '
       ) AS chunk_text
FROM ch
"""


# r6: session-level rollup — same 30-minute gap rule as event_sessions,
# aggregated to one row per (user, session).  Sums are per-row e6 ints
# before aggregation; CAST AS BIGINT defeats DuckDB's HUGEINT widening.
EVENT_SESSION_STATS_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, {_e6('value')} AS v,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30*60*1000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
seq AS (
  SELECT user_id, ts_us, v,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ts_us) AS start_us,
       max(ts_us) AS end_us,
       max(ts_us) - min(ts_us) AS duration_us,
       CAST(sum(v) AS BIGINT) AS sum_value_e6
FROM seq GROUP BY user_id, session_seq
"""


# r6: duplicated-n-gram coverage — per doc, the fraction of its
# distinct 3-token shingles (the engine-shared code family in
# SHINGLES_CTE) that occur in >= 2 documents.  with_shingles emits
# DISTINCT codes per doc, so COUNT(*) per code == doc frequency.
DEDUP_NGRAM_COVERAGE_SQL = f"""
WITH {SHINGLES_CTE},
ex AS (
  SELECT doc_id, unnest(shingles) AS code FROM shingled
),
dfc AS (
  SELECT code, CAST(count(*) AS BIGINT) AS df FROM ex GROUP BY code
)
SELECT ex.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN dfc.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup,
       CAST((1000000 * sum(CASE WHEN dfc.df >= 2 THEN 1 ELSE 0 END))
            // count(*) AS BIGINT) AS dup_frac_e6
FROM ex JOIN dfc USING (code)
GROUP BY ex.doc_id
"""


# r6: expected label-erased triple multiset for the Turtle bnode /
# collection roundtrip — 8 triples per document row (see the query
# docstring), aggregated the same way the Spark side aggregates its
# parse output.
RDF_TURTLE_BNODE_SQL = """
WITH raw AS (
  SELECT 'ex:d' || CAST(doc_id AS VARCHAR) AS s, 'ex:meta' AS p,
         '_:' AS o, 'iri' AS o_kind, '' AS o_lang, '' AS o_datatype
  FROM documents
  UNION ALL
  SELECT '_:', 'ex:lang', lang, 'literal', '', '' FROM documents
  UNION ALL
  SELECT '_:', 'ex:source', source, 'literal', '', '' FROM documents
  UNION ALL
  SELECT 'ex:d' || CAST(doc_id AS VARCHAR), 'ex:sig',
         '_:', 'iri', '', '' FROM documents
  UNION ALL
  SELECT '_:', 'rdf:first', CAST(n_chars AS VARCHAR),
         'literal', '', 'xsd:integer' FROM documents
  UNION ALL
  SELECT '_:', 'rdf:rest', '_:', 'iri', '', '' FROM documents
  UNION ALL
  SELECT '_:', 'rdf:first', 'true', 'literal', '', 'xsd:boolean'
  FROM documents
  UNION ALL
  SELECT '_:', 'rdf:rest', 'rdf:nil', 'iri', '', '' FROM documents
)
SELECT s, p, o, o_kind, o_lang, o_datatype,
       CAST(count(*) AS BIGINT) AS n
FROM raw GROUP BY ALL
"""


# ---------------------------------------------------------------------------
# Round-6c: funnel / sketch / tokenizer-training / ASK / DESCRIBE.
# ---------------------------------------------------------------------------

# Ordered funnel signup -> view -> purchase, each step strictly after
# the previous; min(BIGINT) stays BIGINT in DuckDB (no HUGEINT cast
# needed), epoch_us matches Spark's unix_micros under the UTC pin.
EVENT_FUNNEL_SQL = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
s1 AS (SELECT user_id, min(ts_us) AS t1_us FROM ev
       WHERE event_type = 'signup' GROUP BY 1),
s2 AS (SELECT e.user_id, min(e.ts_us) AS t2_us
       FROM ev e JOIN s1 USING (user_id)
       WHERE e.event_type = 'view' AND e.ts_us > s1.t1_us GROUP BY 1),
s3 AS (SELECT e.user_id, min(e.ts_us) AS t3_us
       FROM ev e JOIN s2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts_us > s2.t2_us GROUP BY 1)
SELECT u.user_id,
       CAST(CASE WHEN t3_us IS NOT NULL THEN 3
                 WHEN t2_us IS NOT NULL THEN 2
                 WHEN t1_us IS NOT NULL THEN 1
                 ELSE 0 END AS INTEGER) AS reached,
       t1_us, t2_us, t3_us
FROM (SELECT DISTINCT user_id FROM ev) u
LEFT JOIN s1 USING (user_id)
LEFT JOIN s2 USING (user_id)
LEFT JOIN s3 USING (user_id)
"""


# Char-level rolling hash (grammar charcode): fold (31a + ascii(c)) % P
# with a prepended 0 seed — list_reduce uses the first element as init.
_CHARCODE = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT),"
    " list_transform(string_split({col}, ''),"
    " c -> CAST(ascii(c) AS BIGINT))),"
    f" (a, c) -> (a * 31 + c) % {G.HASH_P})"
)

_CMS_ROW_UNION = "\nUNION ALL\n".join(
    f"SELECT cnt, hcode, {i} AS r,"
    f" ((({G.hash_a(G.CMS_HASH_OFFSET + i)} * hcode"
    f" + {G.hash_b(G.CMS_HASH_OFFSET + i)}) % {G.HASH_P})"
    f" % {G.CMS_W}) AS b FROM hc"
    for i in range(G.CMS_D)
)

_CMS_TOP_UNION = "\nUNION ALL\n".join(
    f"SELECT token, cnt, rnk, {i} AS r,"
    f" ((({G.hash_a(G.CMS_HASH_OFFSET + i)} * hcode"
    f" + {G.hash_b(G.CMS_HASH_OFFSET + i)}) % {G.HASH_P})"
    f" % {G.CMS_W}) AS b FROM top"
    for i in range(G.CMS_D)
)

HEAVY_HITTERS_CMS_SQL = f"""
WITH tok AS (
  SELECT unnest(list_filter(string_split(text, ' '), t -> t != '')) AS token
  FROM documents
),
tc AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY 1),
hc AS MATERIALIZED (
  SELECT token, cnt, {_CHARCODE.format(col='token')} AS hcode FROM tc
),
sk AS MATERIALIZED (
  SELECT r, b, CAST(sum(cnt) AS BIGINT) AS bucket_cnt
  FROM ({_CMS_ROW_UNION}) GROUP BY 1, 2
),
top AS MATERIALIZED (
  SELECT token, cnt, hcode,
         row_number() OVER (ORDER BY cnt DESC, token) AS rnk
  FROM hc QUALIFY rnk <= {G.CMS_TOP_K}
),
est AS (
  SELECT t.token, t.cnt, t.rnk, min(sk.bucket_cnt) AS cms_count
  FROM ({_CMS_TOP_UNION}) t JOIN sk USING (r, b)
  GROUP BY 1, 2, 3
)
SELECT token, CAST(rnk AS INTEGER) AS rnk, cnt AS true_count,
       cms_count, cms_count - cnt AS overcount
FROM est
"""


# One BPE merge round: weighted adjacent-symbol pair counts over the
# word-frequency table, symbols = chars + '$' end-of-word marker.
BPE_MERGE_PAIRS_SQL = f"""
WITH tok AS (
  SELECT unnest(list_filter(string_split(text, ' '), t -> t != '')) AS word
  FROM documents
),
wf AS (SELECT word, CAST(count(*) AS BIGINT) AS wf FROM tok GROUP BY 1),
sym AS (
  SELECT wf, list_append(string_split(word, ''), '$') AS cs FROM wf
),
pr AS (
  SELECT cs[i] AS lhs, cs[i + 1] AS rhs, wf
  FROM sym, unnest(generate_series(1, len(cs) - 1)) AS u(i)
),
pc AS (
  SELECT lhs, rhs, CAST(sum(wf) AS BIGINT) AS cnt FROM pr GROUP BY 1, 2
)
SELECT CAST(rnk AS INTEGER) AS rnk, lhs, rhs, cnt FROM (
  SELECT lhs, rhs, cnt,
         row_number() OVER (ORDER BY cnt DESC, lhs, rhs) AS rnk
  FROM pc
) WHERE rnk <= {G.CMS_TOP_K}
"""


# SPARQL ASK: existence probes as int-cast booleans.
SPARQL_ASK_SQL = f"""
{_KG_CTES},
tri AS (SELECT DISTINCT s, p, o FROM {_QUADS_UNION})
SELECT 'commerce_scored' AS q,
       CAST(EXISTS(
         SELECT 1 FROM tri t1
         JOIN tri t3 ON t3.s = t1.s AND t3.p = 'ex:score'
         WHERE t1.p = 'rdf:type' AND t1.o = 'ex:Commerce'
           AND CAST(t3.o AS INT) >= 2
       ) AS INTEGER) AS ask
UNION ALL
SELECT 'nosuch' AS q,
       CAST(EXISTS(
         SELECT 1 FROM tri
         WHERE p = 'rdf:type' AND o = 'ex:NoSuchClass'
       ) AS INTEGER) AS ask
"""


# SPARQL DESCRIBE: outgoing edges of the matched subject set.
SPARQL_DESCRIBE_SQL = f"""
{_KG_CTES},
tri AS (SELECT DISTINCT s, p, o FROM {_QUADS_UNION}),
subj AS (
  SELECT DISTINCT t1.s
  FROM tri t1
  JOIN tri t3 ON t3.s = t1.s AND t3.p = 'ex:score'
  WHERE t1.p = 'rdf:type' AND t1.o = 'ex:Commerce'
    AND CAST(t3.o AS INT) >= 3
)
SELECT t.s, t.p, t.o FROM tri t JOIN subj USING (s)
"""


# r6c: isNumeric() — objects carrying a numeric xsd datatype on the
# distinct full-term triple set (only the proxy ex:score literals).
SPARQL_ISNUMERIC_SQL = f"""
{_KG_CTES},
trif AS (SELECT DISTINCT s, p, o, o_kind, o_lang, o_datatype
         FROM {_QUADS_UNION})
SELECT p, CAST(count(*) AS BIGINT) AS n
FROM trif
WHERE o_datatype IN ('xsd:integer', 'xsd:int', 'xsd:long', 'xsd:short',
                     'xsd:byte', 'xsd:decimal', 'xsd:double', 'xsd:float')
GROUP BY p ORDER BY p
"""

# r6c: sameTerm() pair filter — ordered co-mention pairs per document
# over the distinct mention-edge set: m·(m−1) for m distinct mentions
# (documents with a single mention produce no pair and are absent).
SPARQL_SAMETERM_SQL = f"""
{_KG_CTES},
me AS (SELECT DISTINCT '{G.DOC_IRI_PREFIX}' || doc_id AS d, mention_iri
       FROM mentions)
SELECT d, CAST(m * (m - 1) AS BIGINT) AS np
FROM (SELECT d, count(*) AS m FROM me GROUP BY d)
WHERE m >= 2 ORDER BY d
"""

# r6c: ENCODE_FOR_URI over the mention IRI's path remainder — the
# source/norm charset is [a-z0-9_/], so the only encoded byte is the
# path '/' (%2F); underscores and alphanumerics are unreserved in both
# engines.
SPARQL_ENCODE_SQL = f"""
{_KG_CTES},
me AS (SELECT DISTINCT '{G.DOC_IRI_PREFIX}' || doc_id AS d, mention_iri
       FROM mentions)
SELECT d, replace(substr(mention_iri, {len(G.MENTION_IRI_PREFIX) + 1}),
                  '/', '%2F') AS enc
FROM me ORDER BY d, enc
"""

# r6c: term-constructor BINDs — the filters are tautologies over the
# constructed carriers, so the result is exactly the per-entity
# (label, score) attribute pair with the score's lexical form.
SPARQL_TERM_CTORS_SQL = f"""
{_KG_CTES}
SELECT entity_id AS e, label AS lab, CAST(score AS VARCHAR) AS score2
FROM attrs ORDER BY e
"""


# r6c: Adamic-Adar + Jaccard link prediction — identical wedge
# enumeration to ENTITY_LINK_PRED_SQL with the bitlen-quantized
# inverse-log hinge weight (1e6 DIV bitlen(deg)) and an e6 Jaccard on
# full endpoint degrees; sums CAST to BIGINT (HUGEINT trap).
ENTITY_LINK_ADAMIC_SQL = f"""
{_KG_CTES},
doc_ents AS (
  SELECT DISTINCT mm.doc_id, e.entity_id
  FROM mm JOIN eids e ON e.label = mm.root
),
coocc AS MATERIALIZED (
  SELECT a.entity_id AS entity_a, b.entity_id AS entity_b
  FROM doc_ents a JOIN doc_ents b
    ON b.doc_id = a.doc_id AND a.entity_id < b.entity_id
  GROUP BY 1, 2
),
bi_all AS MATERIALIZED (
  SELECT entity_a AS src, entity_b AS dst FROM coocc
  UNION ALL
  SELECT entity_b AS src, entity_a AS dst FROM coocc
),
deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM bi_all GROUP BY src),
bi2 AS MATERIALIZED (
  SELECT b.src, b.dst,
         CAST(1000000 // length(bin(d.deg)) AS BIGINT) AS w
  FROM bi_all b JOIN deg d USING (src)
  WHERE d.deg <= 64
),
aa_cand AS (
  SELECT w1.dst AS a, w2.dst AS b, CAST(count(*) AS BIGINT) AS cn,
         CAST(sum(w1.w) AS BIGINT) AS aa
  FROM bi2 w1 JOIN bi2 w2 ON w2.src = w1.src AND w1.dst < w2.dst
  GROUP BY 1, 2 HAVING count(*) >= 2
)
SELECT c.a AS entity_a, c.b AS entity_b, c.cn, c.aa,
       CAST((1000000 * c.cn) // (da.deg + db.deg - c.cn) AS BIGINT) AS jac_e6
FROM aa_cand c
JOIN deg da ON da.src = c.a
JOIN deg db ON db.src = c.b
LEFT JOIN coocc e ON e.entity_a = c.a AND e.entity_b = c.b
WHERE e.entity_a IS NULL
"""


# r6c: containment near-dup — C = |∩| / min(|A|,|B|) on the distinct
# shingle sets, integer e6 (1e6·|∩| // min len; shingle sets are never
# empty — the index sequence is tail-padded to ≥ 1).
DEDUP_CONTAINMENT_SQL = f"""
WITH {SHINGLES_CTE},
cont AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(1000000 * len(list_intersect(a.shingles, b.shingles))
              AS BIGINT)
           // least(len(a.shingles), len(b.shingles)) AS cont_e6
  FROM shingled a JOIN shingled b ON a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(cont_e6 AS BIGINT) AS cont_e6
FROM cont WHERE cont_e6 >= 800000
"""


# r6c: JSON-LD @list roundtrip — positional rows straight from the
# nation table (pos = per-region rank by nationkey), names as plain
# literals, keys as xsd:integer-typed lexical forms.
JSONLD_LIST_SQL = """
WITH ranked AS (
  SELECT n_regionkey, n_nationkey, n_name,
         CAST(row_number() OVER (PARTITION BY n_regionkey
                                 ORDER BY n_nationkey) - 1 AS INT) AS pos
  FROM nation
)
SELECT 'ex:region' || n_regionkey AS s, 'ex:natnames' AS p, pos,
       n_name AS o, '' AS o_datatype
FROM ranked
UNION ALL
SELECT 'ex:region' || n_regionkey, 'ex:natkeys', pos,
       CAST(n_nationkey AS VARCHAR), 'xsd:integer'
FROM ranked
"""


# r6c: multi-round BPE — three unrolled merge rounds; per round the
# argmax non-self pair (count DESC, lhs, rhs) applies to every symbol
# list via the same flag/drop/substitute array rewrite as the Spark
# loop body (lhs ≠ rhs ⇒ matches never overlap ⇒ the simultaneous
# rewrite is the greedy result).
def _bpe_round(prev: str, m: str) -> str:
    return f"""
  SELECT word, wf, list_transform(
      list_filter(generate_series(1, len(cs)),
        i -> NOT (coalesce(cs[i - 1], '') = {m}.lhs
                  AND cs[i] = {m}.rhs)),
      i -> CASE WHEN coalesce(cs[i + 1], '') = {m}.rhs
                 AND cs[i] = {m}.lhs
            THEN {m}.lhs || {m}.rhs ELSE cs[i] END) AS cs
  FROM {prev}, {m}
"""


def _bpe_pick(prev: str) -> str:
    return f"""
  SELECT lhs, rhs, CAST(sum(wf) AS BIGINT) AS cnt FROM (
    SELECT cs[i] AS lhs, cs[i + 1] AS rhs, wf
    FROM {prev}, unnest(generate_series(1, len(cs) - 1)) AS u(i)
  ) GROUP BY 1, 2 HAVING lhs != rhs
  ORDER BY cnt DESC, lhs, rhs LIMIT 1
"""


BPE_VOCAB_MERGES_SQL = f"""
WITH tok AS (
  SELECT unnest(list_filter(string_split(text, ' '), t -> t != '')) AS word
  FROM documents
),
wf AS (SELECT word, CAST(count(*) AS BIGINT) AS wf FROM tok GROUP BY 1),
s1 AS MATERIALIZED (
  SELECT word, wf, list_append(string_split(word, ''), '$') AS cs FROM wf
),
m1 AS MATERIALIZED ({_bpe_pick('s1')}),
s2 AS MATERIALIZED ({_bpe_round('s1', 'm1')}),
m2 AS MATERIALIZED ({_bpe_pick('s2')}),
s3 AS MATERIALIZED ({_bpe_round('s2', 'm2')}),
m3 AS MATERIALIZED ({_bpe_pick('s3')})
SELECT 1 AS rnd, lhs, rhs, cnt FROM m1
UNION ALL SELECT 2, lhs, rhs, cnt FROM m2
UNION ALL SELECT 3, lhs, rhs, cnt FROM m3
"""


# r6c: integer-exact MIPS top-k — e3-quantized components, int64 dot
# (scale e6), rank by (dot DESC, neighbor_id).
ANN_MIPS_SQL = """
WITH v AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(1000 * CAST(x AS DOUBLE)) AS BIGINT)) AS e3
  FROM embeddings
),
q AS (SELECT * FROM v WHERE vec_id < 20),
s AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(generate_series(1, len(q.e3)),
                                      i -> q.e3[i] * c.e3[i]))
              AS BIGINT) AS dot_e6
  FROM q JOIN v c ON c.vec_id != q.vec_id
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, dot_e6 FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY dot_e6 DESC, neighbor_id) AS rank
  FROM s
) WHERE rank <= 5
"""

# r6c: retention cohorts — integer epoch-day DIV 7 weeks (engine
# week-truncation rules differ; day arithmetic does not).
EVENT_RETENTION_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 // 7
              AS BIGINT) AS week
  FROM events
),
cohort AS (SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY 1)
SELECT c.cohort_week, uw.week - c.cohort_week AS week_offset,
       CAST(count(DISTINCT uw.user_id) AS BIGINT) AS n_users
FROM uw JOIN cohort c USING (user_id)
GROUP BY 1, 2
"""


# r6c: deterministic negative-edge sampling — identical affine-hash
# corruption arithmetic to the Spark builder (rolling char hash mod
# FP_MOD, per-slot affine mod HASH_P mod |entities|, id-ordered rank
# lookup, degenerate + accidental-positive drops).
KG_NEGATIVE_EDGES_SQL = f"""
{_KG_CTES},
doc_ents AS (
  SELECT DISTINCT mm.doc_id, e.entity_id
  FROM mm JOIN eids e ON e.label = mm.root
),
coocc AS MATERIALIZED (
  SELECT a.entity_id AS entity_a, b.entity_id AS entity_b
  FROM doc_ents a JOIN doc_ents b
    ON b.doc_id = a.doc_id AND a.entity_id < b.entity_id
  GROUP BY 1, 2
),
eidx AS MATERIALIZED (
  SELECT entity_id,
         row_number() OVER (ORDER BY entity_id) - 1 AS rank
  FROM (SELECT DISTINCT entity_id FROM entities)
),
nn AS (SELECT count(*) AS n FROM eidx),
hc AS (
  SELECT entity_a, entity_b,
    list_reduce(list_prepend(CAST(0 AS BIGINT),
      list_transform(string_split(entity_a || '|' || entity_b, ''),
                     c -> CAST(ascii(c) AS BIGINT))),
      (a, b) -> (a * 31 + b) % 1000000007) AS hcode
  FROM coocc
),
negcand AS (
  SELECT hc.entity_a, hc.entity_b, s.i AS slot, e.entity_id AS neg_entity
  FROM hc
  CROSS JOIN nn
  CROSS JOIN (SELECT unnest(generate_series(1, 2)) AS i) s
  JOIN eidx e
    ON e.rank = CASE s.i WHEN 1 THEN (749446868 * hcode + 12191404) % 2147483647 % nn.n WHEN 2 THEN (1763351096 * hcode + 12231907) % 2147483647 % nn.n END
  WHERE e.entity_id != hc.entity_a AND e.entity_id != hc.entity_b
)
SELECT c.entity_a, c.entity_b, CAST(c.slot AS INT) AS slot, c.neg_entity
FROM negcand c
LEFT JOIN coocc p
  ON p.entity_a = least(c.entity_a, c.neg_entity)
 AND p.entity_b = greatest(c.entity_a, c.neg_entity)
WHERE p.entity_a IS NULL
"""


# r6c: quality-aware keeper — the min-id clusters re-decided by
# (quality_e6 DESC, doc_id ASC) within each cluster.
DEDUP_KEEP_BEST_SQL = f"""
WITH RECURSIVE {SHINGLES_CTE}, {_CLUSTERS_CTES},
q AS (
  SELECT doc_id,
    CAST(floor(1e6 * (0.5 * (1 - len(list_filter(string_split(text, ' '),
                       t -> t IN ({_STOP_LIST})))::DOUBLE
                       / len(string_split(text, ' ')))
        + 0.3 * least(1.0, len(string_split(text, ' ')) / 50.0)
        + 0.2 * len(list_distinct(string_split(text, ' ')))::DOUBLE
                / len(string_split(text, ' ')))) AS BIGINT) AS quality_e6
  FROM documents
),
best AS (
  SELECT keep_doc_id, doc_id AS best_doc_id FROM (
    SELECT c.keep_doc_id, c.doc_id,
           row_number() OVER (PARTITION BY c.keep_doc_id
                              ORDER BY q.quality_e6 DESC, c.doc_id)
             AS rn
    FROM ckeep c JOIN q USING (doc_id)
  ) WHERE rn = 1
)
SELECT c.doc_id, CAST(b.best_doc_id AS BIGINT) AS keep_doc_id
FROM ckeep c JOIN best b USING (keep_doc_id)
"""


# r6c: median/MAD outliers — identical half-unit integer interpolation
# to the Spark builder (med_2x, dev_2x, mad_4x; flag 2*dev > 3*mad).
EVENT_OUTLIERS_SQL = """
WITH ev AS (
  SELECT event_type, event_id,
         CAST(floor(1e6 * CAST(value AS DOUBLE)) AS BIGINT) AS v_e6
  FROM events
),
r1 AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY v_e6) - 1 AS i,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM ev
),
med AS (
  SELECT event_type,
    CAST(sum(CASE WHEN i = (n-1) // 2 THEN v_e6 * (2 - (n-1) % 2)
             WHEN i = (n-1) // 2 + 1 THEN v_e6 * ((n-1) % 2)
             ELSE 0 END) AS BIGINT) AS med_2x
  FROM r1 GROUP BY event_type
),
dev AS (
  SELECT ev.event_type, ev.event_id, ev.v_e6,
         abs(2 * ev.v_e6 - m.med_2x) AS dev_2x
  FROM ev JOIN med m USING (event_type)
),
r2 AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY dev_2x) - 1 AS i,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM dev
),
mad AS (
  SELECT event_type,
    2 * CAST(sum(CASE WHEN i = (n-1) // 2 THEN dev_2x * (2 - (n-1) % 2)
                 WHEN i = (n-1) // 2 + 1 THEN dev_2x * ((n-1) % 2)
                 ELSE 0 END) AS BIGINT) AS mad_4x
  FROM r2 GROUP BY event_type
)
SELECT d.event_type, d.event_id, d.v_e6
FROM dev d JOIN mad USING (event_type)
WHERE 2 * d.dev_2x > 3 * mad.mad_4x
"""


# r6c: native session_window parity — gap-rule sessionization with the
# EXACT Spark boundary (a gap == 30 min still EXTENDS the session:
# the window closes only when the next event is strictly beyond
# last + gap); end = last event + gap.
EVENT_SESSION_WINDOW_SQL = """
WITH ev AS (
  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
         CAST(floor(1e6 * CAST(value AS DOUBLE)) AS BIGINT) AS v_e6,
         event_id
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
                   OR ts_us - lag(ts_us) OVER w > 1800000000
            THEN 1 ELSE 0 END AS new_sess
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sess AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id
                                ORDER BY ts_us, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id, CAST(min(ts_us) AS BIGINT) AS start_us,
       CAST(max(ts_us) + 1800000000 AS BIGINT) AS end_us,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(v_e6) AS BIGINT) AS sum_value_e6
FROM sess GROUP BY user_id, sid
"""


# r6c: language-ID confusion matrix over the langid oracle chain.
LANGID_CONFUSION_SQL = f"""
WITH {_LANGID_CTES}
SELECT lang, predicted_lang, CAST(count(*) AS BIGINT) AS n_docs
FROM lpred GROUP BY 1, 2
"""


# r6c: one message-passing round — neighbor degree/score aggregation
# over the bidirectional co-occurrence edges.
ENTITY_NEIGHBOR_AGG_SQL = f"""
{_KG_CTES},
doc_ents AS (
  SELECT DISTINCT mm.doc_id, e.entity_id
  FROM mm JOIN eids e ON e.label = mm.root
),
coocc AS MATERIALIZED (
  SELECT a.entity_id AS entity_a, b.entity_id AS entity_b
  FROM doc_ents a JOIN doc_ents b
    ON b.doc_id = a.doc_id AND a.entity_id < b.entity_id
  GROUP BY 1, 2
),
bi AS MATERIALIZED (
  SELECT entity_a AS src, entity_b AS dst FROM coocc
  UNION ALL
  SELECT entity_b AS src, entity_a AS dst FROM coocc
),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM bi GROUP BY src)
SELECT b.src AS entity_id,
       CAST(count(*) AS BIGINT) AS n_neighbors,
       CAST(sum(d.deg) AS BIGINT) AS nbr_deg_sum,
       CAST(sum(at.score) AS BIGINT) AS nbr_score_sum
FROM bi b
JOIN deg d ON d.src = b.dst
JOIN attrs at ON at.entity_id = b.dst
GROUP BY b.src
"""


# r6c: tokenizer application — the 3-round vocabulary applied to every
# document (word-level join + per-doc sums), sharing the merge-round
# CTE generators with BPE_VOCAB_MERGES_SQL.
BPE_ENCODE_SQL = f"""
WITH tok AS (
  SELECT unnest(list_filter(string_split(text, ' '), t -> t != '')) AS word
  FROM documents
),
wf AS (SELECT word, CAST(count(*) AS BIGINT) AS wf FROM tok GROUP BY 1),
s1 AS MATERIALIZED (
  SELECT word, wf, list_append(string_split(word, ''), '$') AS cs FROM wf
),
m1 AS MATERIALIZED ({_bpe_pick('s1')}),
s2 AS MATERIALIZED ({_bpe_round('s1', 'm1')}),
m2 AS MATERIALIZED ({_bpe_pick('s2')}),
s3 AS MATERIALIZED ({_bpe_round('s2', 'm2')}),
m3 AS MATERIALIZED ({_bpe_pick('s3')}),
s4 AS MATERIALIZED ({_bpe_round('s3', 'm3')}),
dwords AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), t -> t != '')) AS word
  FROM documents
)
SELECT d.doc_id,
       CAST(sum(length(d.word) + 1) AS BIGINT) AS n_syms_before,
       CAST(sum(len(s4.cs)) AS BIGINT) AS n_syms_after
FROM dwords d JOIN s4 USING (word)
GROUP BY d.doc_id
"""


# r6c: cumulative-distinct-user curve — first-day contribution + cumsum.
EVENT_CUM_USERS_SQL = """
WITH fd AS (
  SELECT user_id,
         min(CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS BIGINT))
           AS first_day
  FROM events GROUP BY user_id
),
pd AS (SELECT first_day, CAST(count(*) AS BIGINT) AS new_users
       FROM fd GROUP BY first_day)
SELECT first_day AS day, new_users,
       CAST(sum(new_users) OVER (ORDER BY first_day
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_users
FROM pd
"""

# r6c: label inverted index — token postings pinned by the commutative
# rolling-hash checksum (sum of per-entity char hashes mod FP_MOD).
KG_LABEL_INDEX_SQL = f"""
{{_KG_CTES}},
postings AS (
  SELECT DISTINCT entity_id,
         unnest(list_filter(string_split(label, ' '), t -> t != ''))
           AS token
  FROM attrs
),
hashed AS (
  SELECT token, entity_id,
    list_reduce(list_prepend(CAST(0 AS BIGINT),
      list_transform(string_split(entity_id, ''),
                     c -> CAST(ascii(c) AS BIGINT))),
      (a, b) -> (a * 31 + b) % {G.FP_MOD}) AS eh
  FROM postings
)
SELECT token, CAST(count(*) AS BIGINT) AS n_entities,
       CAST(sum(eh) % {G.FP_MOD} AS BIGINT) AS postings_hash
FROM hashed GROUP BY token
"""
KG_LABEL_INDEX_SQL = KG_LABEL_INDEX_SQL.replace("{_KG_CTES}", _KG_CTES)


# r6c: shared coocc CTE tail for the graph-analytics additions.
_COOCC_TAIL = """,
doc_ents AS (
  SELECT DISTINCT mm.doc_id, e.entity_id
  FROM mm JOIN eids e ON e.label = mm.root
),
coocc AS MATERIALIZED (
  SELECT a.entity_id AS entity_a, b.entity_id AS entity_b
  FROM doc_ents a JOIN doc_ents b
    ON b.doc_id = a.doc_id AND a.entity_id < b.entity_id
  GROUP BY 1, 2
)"""

# r6c: local clustering coefficient — triangles over ordered edges +
# degree over the bidirectional frame, coefficient on the e6 integer
# grid ('//' = integer division; deg < 2 pins 0).
ENTITY_CLUSTERING_SQL = f"""
{_KG_CTES}{_COOCC_TAIL},
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
    SELECT entity_a AS node FROM coocc
    UNION ALL SELECT entity_b FROM coocc
  ) GROUP BY node
),
tri AS MATERIALIZED (
  SELECT ab.entity_a AS a, ab.entity_b AS b, bc.entity_b AS c
  FROM coocc ab
  JOIN coocc bc ON bc.entity_a = ab.entity_b
  JOIN coocc ac ON ac.entity_a = ab.entity_a AND ac.entity_b = bc.entity_b
),
tc AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  ) GROUP BY node
)
SELECT d.node AS entity_id, d.degree,
       COALESCE(tc.n_triangles, 0) AS n_triangles,
       CAST(CASE WHEN d.degree >= 2
                 THEN (2000000 * COALESCE(tc.n_triangles, 0))
                      // (d.degree * (d.degree - 1))
                 ELSE 0 END AS BIGINT) AS clustering_e6
FROM deg d LEFT JOIN tc USING (node)
"""

# r6c: log2-bucketed degree distribution (bucket = bitlen(degree)).
ENTITY_DEGREE_HIST_SQL = f"""
{_KG_CTES}{_COOCC_TAIL},
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
    SELECT entity_a AS node FROM coocc
    UNION ALL SELECT entity_b FROM coocc
  ) GROUP BY node
)
SELECT CAST(length(bin(degree)) AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_entities,
       MIN(degree) AS min_degree,
       MAX(degree) AS max_degree
FROM deg GROUP BY bucket
"""

# r6c: personalized PageRank — seed indicator from the minted digest's
# first hex char (engine-agnostic string rule), 4 unrolled iterations,
# teleport mass returning only to seeds.
_PPR_ITER = """,
ppr{k} AS (
  SELECT n.entity_id, n.is_seed,
         CAST(CASE WHEN n.is_seed THEN 150000 ELSE 0 END
              + (17 * COALESCE(inc.s, 0)) // 20 AS BIGINT) AS score
  FROM ppr_nodes n LEFT JOIN (
    SELECT e.dst AS entity_id, SUM(p.score // d.d) AS s
    FROM ppr_edges e
    JOIN ppr{km1} p ON p.entity_id = e.src
    JOIN ppr_deg d ON d.src = e.src
    GROUP BY e.dst
  ) inc USING (entity_id)
)"""

ENTITY_PPR_SQL = (
    f"""{_KG_CTES}{_COOCC_TAIL},
ppr_edges AS MATERIALIZED (
  SELECT entity_a AS src, entity_b AS dst FROM coocc
  UNION ALL
  SELECT entity_b AS src, entity_a AS dst FROM coocc
),
ppr_deg AS MATERIALIZED (
  SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM ppr_edges GROUP BY src
),
ppr_nodes AS MATERIALIZED (
  SELECT DISTINCT entity_id,
         ascii(substr(entity_id, {len(G.ENTITY_IRI_PREFIX) + 1}, 1)) % 4 = 0
           AS is_seed
  FROM eids
),
ppr0 AS (
  SELECT entity_id, is_seed,
         CAST(CASE WHEN is_seed THEN 1000000 ELSE 0 END AS BIGINT) AS score
  FROM ppr_nodes
)"""
    + "".join(_PPR_ITER.format(k=k, km1=k - 1) for k in range(1, 5))
    + """
SELECT entity_id, is_seed, score FROM ppr4
"""
)


# r6c: PMI collocations — log-domain integer score (overflow-safe at
# any corpus size; see queries.term_pmi).
TERM_PMI_SQL = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), t -> t != '') AS toks
  FROM documents
),
uni AS MATERIALIZED (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks, UNNEST(toks) AS u(w) GROUP BY w
),
bi AS MATERIALIZED (
  SELECT toks[i] AS w1, toks[i+1] AS w2, CAST(COUNT(*) AS BIGINT) AS c_xy
  FROM toks, UNNEST(generate_series(1, len(toks) - 1)) AS t(i)
  WHERE len(toks) >= 2
  GROUP BY 1, 2
),
tot AS (
  SELECT (SELECT SUM(c) FROM uni) AS n_tokens,
         (SELECT SUM(c_xy) FROM bi) AS n_bigrams
)
SELECT b.w1, b.w2, b.c_xy,
       CAST(length(bin(b.c_xy)) + 2 * length(bin(CAST(t.n_tokens AS BIGINT)))
            - length(bin(CAST(t.n_bigrams AS BIGINT)))
            - length(bin(x.c)) - length(bin(y.c)) AS INT) AS pmi_bits
FROM bi b
JOIN uni x ON x.w = b.w1
JOIN uni y ON y.w = b.w2
CROSS JOIN tot t
WHERE b.c_xy >= 5
"""


# r6c: sign-random-projection LSH bucket histogram (grammar.SRP_*).
EMBEDDING_SRP_SQL = f"""
WITH v AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(1000 * CAST(x AS DOUBLE)) AS BIGINT)) AS e3
  FROM embeddings
),
sigs AS (
  SELECT vec_id,
         CAST(list_sum(list_transform(generate_series(0, {G.SRP_PLANES - 1}),
           k -> CASE WHEN list_sum(list_transform(generate_series(1, len(e3)),
                  d -> (CASE WHEN (({G.hash_a(G.SRP_HASH_IDX)} * (k * len(e3) + d - 1)
                                   + {G.hash_b(G.SRP_HASH_IDX)}) % {G.HASH_P}) % 2 = 0
                        THEN 1 ELSE -1 END) * e3[d])) >= 0
                THEN (1::BIGINT << k) ELSE 0 END)) AS BIGINT) AS bucket
  FROM v
)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(vec_id) AS BIGINT) AS sum_vec_id,
       CAST(COUNT(*) * (COUNT(*) - 1) // 2 AS BIGINT) AS n_cand_pairs
FROM sigs GROUP BY bucket
"""


# r6c: incremental minhash dedup — band collisions with at least one
# NEW side (doc_id % 10 = 0), old×old excluded in the join condition.
DEDUP_INCREMENTAL_SQL = f"""
WITH {SHINGLES_CTE},
perms(i, a, b) AS (VALUES {_PERMS_ROWS}),
codes AS (SELECT doc_id, unnest(shingles) AS code FROM shingled),
sig AS (
  SELECT doc_id, i, min((a * code + b) % {G.HASH_P}) AS mh
  FROM codes CROSS JOIN perms GROUP BY doc_id, i
),
bands AS (
  SELECT doc_id, doc_id % 10 = 0 AS is_new,
         CAST(i // {G.LSH_ROWS} AS INT) AS band_id,
         max(CASE WHEN i % {G.LSH_ROWS} = 0 THEN mh END) * {G.HASH_P}
           + max(CASE WHEN i % {G.LSH_ROWS} = 1 THEN mh END) AS band_hash
  FROM sig GROUP BY doc_id, doc_id % 10 = 0, CAST(i // {G.LSH_ROWS} AS INT)
),
cand AS (
  SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
         CASE WHEN a.is_new AND c.is_new THEN 'new-new'
              ELSE 'new-old' END AS pair_kind
  FROM bands a JOIN bands c
    ON a.band_id = c.band_id AND a.band_hash = c.band_hash
   AND a.doc_id < c.doc_id AND (a.is_new OR c.is_new)
  GROUP BY 1, 2, 3
)
SELECT doc_a, doc_b, pair_kind,
  CAST((1000000 * len(list_intersect(sa.shingles, sb.shingles)))
       // (len(sa.shingles) + len(sb.shingles)
           - len(list_intersect(sa.shingles, sb.shingles))) AS BIGINT)
    AS jaccard_e6
FROM cand
JOIN shingled sa ON sa.doc_id = cand.doc_a
JOIN shingled sb ON sb.doc_id = cand.doc_b
"""


# r6c: top-3 co-occurrence neighbors per entity.
ENTITY_TOP_NEIGHBORS_SQL = f"""
{_KG_CTES},
doc_ents AS (
  SELECT DISTINCT mm.doc_id, e.entity_id
  FROM mm JOIN eids e ON e.label = mm.root
),
coocc AS MATERIALIZED (
  SELECT a.entity_id AS entity_a, b.entity_id AS entity_b,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM doc_ents a JOIN doc_ents b
    ON b.doc_id = a.doc_id AND a.entity_id < b.entity_id
  GROUP BY 1, 2
),
bi AS (
  SELECT entity_a AS entity_id, entity_b AS neighbor_id, n_docs FROM coocc
  UNION ALL
  SELECT entity_b, entity_a, n_docs FROM coocc
)
SELECT entity_id, neighbor_id, n_docs, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY entity_id
                               ORDER BY n_docs DESC, neighbor_id) AS rank
  FROM bi
) WHERE rank <= 3
"""


# r6c: MinHash estimator calibration — signature-position agreement vs
# exact shingle Jaccard per LSH candidate pair.
DEDUP_MINHASH_CALIB_SQL = f"""
WITH {SHINGLES_CTE},
perms(i, a, b) AS (VALUES {_PERMS_ROWS}),
codes AS (SELECT doc_id, unnest(shingles) AS code FROM shingled),
sig AS MATERIALIZED (
  SELECT doc_id, i, min((a * code + b) % {G.HASH_P}) AS mh
  FROM codes CROSS JOIN perms GROUP BY doc_id, i
),
bands AS (
  SELECT doc_id, CAST(i // {G.LSH_ROWS} AS INT) AS band_id,
         max(CASE WHEN i % {G.LSH_ROWS} = 0 THEN mh END) * {G.HASH_P}
           + max(CASE WHEN i % {G.LSH_ROWS} = 1 THEN mh END) AS band_hash
  FROM sig GROUP BY doc_id, CAST(i // {G.LSH_ROWS} AS INT)
),
cand AS (
  SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
  FROM bands a JOIN bands c
    ON a.band_id = c.band_id AND a.band_hash = c.band_hash
   AND a.doc_id < c.doc_id
  GROUP BY 1, 2
),
est AS (
  SELECT cand.doc_a, cand.doc_b,
         CAST((1000000 * SUM(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END))
              // {G.MINHASH_PERMS} AS BIGINT) AS est_jaccard_e6
  FROM cand
  JOIN sig sa ON sa.doc_id = cand.doc_a
  JOIN sig sb ON sb.doc_id = cand.doc_b AND sb.i = sa.i
  GROUP BY 1, 2
)
SELECT est.doc_a, est.doc_b, est.est_jaccard_e6,
  CAST((1000000 * len(list_intersect(sa.shingles, sb.shingles)))
       // (len(sa.shingles) + len(sb.shingles)
           - len(list_intersect(sa.shingles, sb.shingles))) AS BIGINT)
    AS exact_jaccard_e6,
  CAST(abs(est.est_jaccard_e6
       - (1000000 * len(list_intersect(sa.shingles, sb.shingles)))
         // (len(sa.shingles) + len(sb.shingles)
             - len(list_intersect(sa.shingles, sb.shingles)))) AS BIGINT)
    AS abs_err_e6
FROM est
JOIN shingled sa ON sa.doc_id = est.doc_a
JOIN shingled sb ON sb.doc_id = est.doc_b
"""


# r6c: held-out bigram surprisal — train on even doc_ids, score odd;
# OOV bigrams counted and excluded from the scored mean.
DOC_SURPRISAL_HELDOUT_SQL = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), t -> t != '') AS toks
  FROM documents
),
db AS MATERIALIZED (
  SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2,
         CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks, UNNEST(generate_series(1, len(toks) - 1)) AS t(i)
  WHERE len(toks) >= 2
  GROUP BY 1, 2, 3
),
bc AS MATERIALIZED (
  SELECT w1, w2, SUM(tf) AS bt FROM db WHERE doc_id % 2 = 0 GROUP BY 1, 2
),
uc AS (SELECT w1, SUM(bt) AS ut FROM bc GROUP BY 1),
sc AS (
  SELECT h.doc_id, h.tf,
         CASE WHEN bc.bt IS NULL THEN 0 ELSE h.tf END AS scored,
         CASE WHEN bc.bt IS NULL THEN h.tf ELSE 0 END AS oov,
         CASE WHEN bc.bt IS NULL THEN 0
              ELSE h.tf * length(bin(CAST(uc.ut // bc.bt AS BIGINT))) END AS s
  FROM db h
  LEFT JOIN bc ON bc.w1 = h.w1 AND bc.w2 = h.w2
  LEFT JOIN uc ON uc.w1 = h.w1
  WHERE h.doc_id % 2 = 1
)
SELECT doc_id,
       CAST(SUM(tf) AS BIGINT) AS n_bigrams,
       CAST(SUM(oov) AS BIGINT) AS n_oov,
       CAST((1000000 * SUM(s)) // SUM(scored) AS BIGINT) AS avg_surprisal_e6
FROM sc GROUP BY doc_id HAVING SUM(scored) > 0
"""


# r6c: equi-width 16-bucket value histogram on the e6 grid.
EVENT_VALUE_HISTOGRAM_SQL = """
WITH v AS (
  SELECT CAST(floor(1000000 * value) AS BIGINT) AS v_e6 FROM events
),
mm AS (SELECT MIN(v_e6) AS min_e6, MAX(v_e6) AS max_e6 FROM v)
SELECT CAST(((v_e6 - min_e6) * 16) // (max_e6 - min_e6 + 1) AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(v_e6) AS lo_e6, MAX(v_e6) AS hi_e6
FROM v CROSS JOIN mm
GROUP BY 1
"""


# r6c: SPARQL VALUES + MIN/MAX aggregates.
SPARQL_VALUES_SQL = f"""
{_KG_CTES},
tri AS (SELECT DISTINCT s, p, o FROM {_QUADS_UNION})
SELECT t1.o AS t,
       MIN(CAST(t2.o AS BIGINT)) AS lo,
       MAX(CAST(t2.o AS BIGINT)) AS hi,
       CAST(COUNT(*) AS BIGINT) AS n
FROM tri t1
JOIN tri t2 ON t2.s = t1.s AND t2.p = 'ex:score'
WHERE t1.p = 'rdf:type' AND t1.o IN ('ex:Commerce', 'ex:Data')
GROUP BY t1.o
"""


# r6c: k-means M-step — integer centroid per (label, dim); the mean
# truncates toward zero (matching Spark's DIV on a sign-split).
EMBEDDING_CENTROIDS_SQL = """
WITH v AS (
  SELECT label,
         list_transform(embedding,
           x -> CAST(round(1000 * CAST(x AS DOUBLE)) AS BIGINT)) AS e3
  FROM embeddings
),
ex AS (
  SELECT label, CAST(d - 1 AS INT) AS dim, e3[d] AS val
  FROM v, UNNEST(generate_series(1, len(e3))) AS t(d)
)
SELECT CAST(label AS INT) AS label, dim,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(CASE WHEN SUM(val) >= 0 THEN SUM(val) // COUNT(*)
                 ELSE -((-SUM(val)) // COUNT(*)) END AS BIGINT) AS mean_e3
FROM ex GROUP BY label, dim
"""


# r6c: k-means E-step — nearest integer centroid, ties to min label.
EMBEDDING_KMEANS_ASSIGN_SQL = """
WITH v AS (
  SELECT vec_id, label,
         list_transform(embedding,
           x -> CAST(round(1000 * CAST(x AS DOUBLE)) AS BIGINT)) AS e3
  FROM embeddings
),
ex AS (
  SELECT label, d AS dim, e3[d] AS val
  FROM v, UNNEST(generate_series(1, len(e3))) AS t(d)
),
cent AS (
  SELECT label, dim,
         CAST(CASE WHEN SUM(val) >= 0 THEN SUM(val) // COUNT(*)
                   ELSE -((-SUM(val)) // COUNT(*)) END AS BIGINT) AS mean_e3
  FROM ex GROUP BY label, dim
),
cent_arr AS (
  SELECT label AS c_label,
         list(mean_e3 ORDER BY dim) AS cent
  FROM cent GROUP BY label
),
scored AS (
  SELECT v.vec_id, c.c_label,
         CAST(list_sum(list_transform(generate_series(1, len(v.e3)),
              i -> (v.e3[i] - c.cent[i]) * (v.e3[i] - c.cent[i])))
           AS BIGINT) AS dist
  FROM v CROSS JOIN cent_arr c
),
sel AS (SELECT vec_id, MIN(dist) AS dist_e6 FROM scored GROUP BY vec_id)
SELECT s.vec_id, CAST(MIN(sc.c_label) AS INT) AS assigned_label,
       CAST(s.dist_e6 AS BIGINT) AS dist_e6
FROM sel s JOIN scored sc ON sc.vec_id = s.vec_id AND sc.dist = s.dist_e6
GROUP BY s.vec_id, s.dist_e6
"""


# r6c: vocabulary growth curve (Heaps-law readout) at 10-doc grain,
# over word-trigram types (the unigram vocab is closed — saturates
# in batch 0).
VOCAB_GROWTH_SQL = """
WITH dt AS (
  SELECT doc_id // 10 AS batch,
         list_filter(string_split(text, ' '), t -> t != '') AS t
  FROM documents
),
toks AS (
  SELECT batch, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS w
  FROM dt, UNNEST(generate_series(1, len(t) - 2)) AS u(i)
  WHERE len(t) >= 3
),
fb AS (
  SELECT w, CAST(MIN(batch) AS BIGINT) AS first_batch FROM toks GROUP BY w
),
pb AS (
  SELECT first_batch, CAST(COUNT(*) AS BIGINT) AS new_types
  FROM fb GROUP BY first_batch
)
SELECT first_batch AS batch, new_types,
       CAST(SUM(new_types) OVER (ORDER BY first_batch
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_size
FROM pb
"""


# r6c: deterministic fixed-fanout neighbor sampling (charcode order).
_NS_KEY = _CHARCODE.format(col="entity_id || '|' || neighbor_id")
ENTITY_NEIGHBOR_SAMPLE_SQL = f"""
{_KG_CTES},
doc_ents AS (
  SELECT DISTINCT mm.doc_id, e.entity_id
  FROM mm JOIN eids e ON e.label = mm.root
),
coocc AS MATERIALIZED (
  SELECT a.entity_id AS entity_a, b.entity_id AS entity_b
  FROM doc_ents a JOIN doc_ents b
    ON b.doc_id = a.doc_id AND a.entity_id < b.entity_id
  GROUP BY 1, 2
),
bi AS (
  SELECT entity_a AS entity_id, entity_b AS neighbor_id FROM coocc
  UNION ALL
  SELECT entity_b, entity_a FROM coocc
),
keyed AS (
  SELECT entity_id, neighbor_id,
         CAST({_NS_KEY} AS BIGINT) AS samp_key
  FROM bi
)
SELECT entity_id, neighbor_id, samp_key, CAST(rn AS INT) AS samp_rank FROM (
  SELECT *, row_number() OVER (PARTITION BY entity_id
                               ORDER BY samp_key, neighbor_id) AS rn
  FROM keyed
) WHERE rn <= 2
"""


# r6c: event debounce — ≥60 s since the previous raw event of the
# same (user, type) key.
EVENT_DEBOUNCE_SQL = """
WITH keyed AS (
  SELECT event_id, user_id, event_type,
         CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS ts_us,
         lag(CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT)) OVER (
           PARTITION BY user_id, event_type
           ORDER BY CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT), event_id
         ) AS prev_us
  FROM events
)
SELECT event_id, user_id, event_type, ts_us
FROM keyed
WHERE prev_us IS NULL OR ts_us - prev_us >= 60000000
"""


# r6c: negated property set — forward edges except the excluded preds.
SPARQL_PATH_NPS_SQL = f"""
{_KG_CTES},
tri AS (SELECT DISTINCT s, p, o FROM {_QUADS_UNION})
SELECT t1.s AS e, t2.o AS o
FROM tri t1
JOIN tri t2 ON t2.s = t1.s
WHERE t1.p = 'rdf:type' AND t1.o = 'ex:Commerce'
  AND t2.p NOT IN ('rdf:type', 'ex:score')
"""


# r6c: event-type Markov transition counts (lag per user).
EVENT_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (
           PARTITION BY user_id
           ORDER BY CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT), event_id
         ) AS prev_type
  FROM events
)
SELECT prev_type AS from_type, event_type AS to_type,
       CAST(COUNT(*) AS BIGINT) AS n_transitions
FROM seq WHERE prev_type IS NOT NULL
GROUP BY 1, 2
"""


# r6c: near-dup cluster size histogram over the keeper table.
DEDUP_CLUSTER_HIST_SQL = f"""
WITH RECURSIVE {SHINGLES_CTE}, {_CLUSTERS_CTES},
sizes AS (
  SELECT keep_doc_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
  FROM ckeep GROUP BY keep_doc_id
)
SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(COUNT(*) * (cluster_size - 1) AS BIGINT) AS n_dropped_docs
FROM sizes GROUP BY cluster_size
"""


# r6c: per-source corpus card.
CORPUS_STATS_SQL = """
WITH t AS (
  SELECT source, lang,
         CAST(len(list_filter(string_split(text, ' '), x -> x != ''))
              AS BIGINT) AS n_toks
  FROM documents
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST((1000000 * SUM(n_toks)) // COUNT(*) AS BIGINT) AS mean_len_e6
FROM t GROUP BY source
"""


# r6c: per-user lifetime summary.
EVENT_USER_LIFETIME_SQL = """
WITH t AS (
  SELECT user_id,
         CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS ts_us,
         CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS BIGINT) AS day
  FROM events
)
SELECT user_id, MIN(ts_us) AS first_us, MAX(ts_us) AS last_us,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT day) AS BIGINT) AS n_active_days,
       CAST((MAX(ts_us) - MIN(ts_us)) // 86400000000 AS BIGINT) AS span_days
FROM t GROUP BY user_id
"""


# r6c: k-means inertia — aggregate over the E-step assignment.
EMBEDDING_KMEANS_INERTIA_SQL = """
WITH v AS (
  SELECT vec_id, label,
         list_transform(embedding,
           x -> CAST(round(1000 * CAST(x AS DOUBLE)) AS BIGINT)) AS e3
  FROM embeddings
),
ex AS (
  SELECT label, d AS dim, e3[d] AS val
  FROM v, UNNEST(generate_series(1, len(e3))) AS t(d)
),
cent AS (
  SELECT label, dim,
         CAST(CASE WHEN SUM(val) >= 0 THEN SUM(val) // COUNT(*)
                   ELSE -((-SUM(val)) // COUNT(*)) END AS BIGINT) AS mean_e3
  FROM ex GROUP BY label, dim
),
cent_arr AS (
  SELECT label AS c_label,
         list(mean_e3 ORDER BY dim) AS cent
  FROM cent GROUP BY label
),
scored AS (
  SELECT v.vec_id, c.c_label,
         CAST(list_sum(list_transform(generate_series(1, len(v.e3)),
              i -> (v.e3[i] - c.cent[i]) * (v.e3[i] - c.cent[i])))
           AS BIGINT) AS dist
  FROM v CROSS JOIN cent_arr c
),
sel AS (SELECT vec_id, MIN(dist) AS dist_e6 FROM scored GROUP BY vec_id),
assigned AS (
  SELECT s.vec_id, CAST(MIN(sc.c_label) AS INT) AS assigned_label,
         CAST(s.dist_e6 AS BIGINT) AS dist_e6
  FROM sel s JOIN scored sc ON sc.vec_id = s.vec_id AND sc.dist = s.dist_e6
  GROUP BY s.vec_id, s.dist_e6
)
SELECT assigned_label, CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(dist_e6) AS BIGINT) AS inertia_e6
FROM assigned GROUP BY assigned_label
"""


# r6c: per-doc type-token ratio (lexical diversity, e6 grid).
DOC_TTR_SQL = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x != '') AS toks
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
       CAST((1000000 * len(list_distinct(toks))) // len(toks) AS BIGINT)
         AS ttr_e6
FROM t WHERE len(toks) > 0
"""


# r6c: class-level co-occurrence matrix (canonicalized pairs).
KG_CLASS_COOCC_SQL = f"""
{_KG_CTES},
doc_ents AS (
  SELECT DISTINCT mm.doc_id, e.entity_id
  FROM mm JOIN eids e ON e.label = mm.root
),
coocc AS MATERIALIZED (
  SELECT a.entity_id AS entity_a, b.entity_id AS entity_b,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM doc_ents a JOIN doc_ents b
    ON b.doc_id = a.doc_id AND a.entity_id < b.entity_id
  GROUP BY 1, 2
)
SELECT least(ca.cls, cb.cls) AS class_a,
       greatest(ca.cls, cb.cls) AS class_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(c.n_docs) AS BIGINT) AS n_doc_links
FROM coocc c
JOIN eclass ca ON ca.entity_id = c.entity_a
JOIN eclass cb ON cb.entity_id = c.entity_b
GROUP BY 1, 2
"""


# r6c: degree-assortativity exact moment sums over directed endpoints.
ENTITY_DEGREE_MOMENTS_SQL = f"""
{_KG_CTES},
doc_ents AS (
  SELECT DISTINCT mm.doc_id, e.entity_id
  FROM mm JOIN eids e ON e.label = mm.root
),
coocc AS MATERIALIZED (
  SELECT a.entity_id AS entity_a, b.entity_id AS entity_b
  FROM doc_ents a JOIN doc_ents b
    ON b.doc_id = a.doc_id AND a.entity_id < b.entity_id
  GROUP BY 1, 2
),
bi AS (
  SELECT entity_a AS src, entity_b AS dst FROM coocc
  UNION ALL SELECT entity_b, entity_a FROM coocc
),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM bi GROUP BY src)
SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(SUM(dx.d) AS BIGINT) AS sum_x,
       CAST(SUM(dy.d) AS BIGINT) AS sum_y,
       CAST(SUM(dx.d * dy.d) AS BIGINT) AS sum_xy,
       CAST(SUM(dx.d * dx.d) AS BIGINT) AS sum_x2,
       CAST(SUM(dy.d * dy.d) AS BIGINT) AS sum_y2
FROM bi
JOIN deg dx ON dx.src = bi.src
JOIN deg dy ON dy.src = bi.dst
"""


# r6c: top-k document search for the fixed query (order data table).
DOC_SEARCH_TOPK_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
q AS (SELECT term FROM (VALUES ('order'), ('data'), ('table')) v(term)),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks WHERE term != '' AND term IN (SELECT term FROM q)
  GROUP BY 1, 2
),
df AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM toks WHERE term != '' AND term IN (SELECT term FROM q)
  GROUP BY 1
),
n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM documents),
scored AS (
  SELECT tf.doc_id,
         CAST(SUM(tf.tf * length(bin(CAST(n.n // df.df AS BIGINT))))
              AS BIGINT) AS score,
         CAST(COUNT(*) AS BIGINT) AS n_terms_hit
  FROM tf JOIN df USING (term) CROSS JOIN n
  GROUP BY tf.doc_id
)
SELECT doc_id, score, n_terms_hit, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM scored
) WHERE rank <= 10
"""


# r6c: two unrolled Lloyd iterations (M→E→M→E), integer-exact.
_KM_M = """
cent{r} AS (
  SELECT cl, dim,
         CAST(CASE WHEN SUM(val) >= 0 THEN SUM(val) // COUNT(*)
                   ELSE -((-SUM(val)) // COUNT(*)) END AS BIGINT) AS m
  FROM (
    SELECT cl, d AS dim, e3[d] AS val
    FROM {src}, UNNEST(generate_series(1, len(e3))) AS t(d)
  ) GROUP BY cl, dim
),
cent_arr{r} AS (
  SELECT cl AS c_label, list(m ORDER BY dim) AS cent
  FROM cent{r} GROUP BY cl
),
scored{r} AS (
  SELECT v.vec_id, v.e3, c.c_label,
         CAST(list_sum(list_transform(generate_series(1, len(v.e3)),
              i -> (v.e3[i] - c.cent[i]) * (v.e3[i] - c.cent[i])))
           AS BIGINT) AS dist
  FROM kmv v CROSS JOIN cent_arr{r} c
),
sel{r} AS (SELECT vec_id, MIN(dist) AS dist FROM scored{r} GROUP BY vec_id),
assigned{r} AS (
  SELECT s.vec_id, any_value(sc.e3) AS e3,
         CAST(MIN(sc.c_label) AS INT) AS cl,
         CAST(s.dist AS BIGINT) AS dist
  FROM sel{r} s
  JOIN scored{r} sc ON sc.vec_id = s.vec_id AND sc.dist = s.dist
  GROUP BY s.vec_id, s.dist
)"""

EMBEDDING_KMEANS_TRAIN_SQL = (
    """
WITH kmv AS (
  SELECT vec_id, CAST(label AS INT) AS cl,
         list_transform(embedding,
           x -> CAST(round(1000 * CAST(x AS DOUBLE)) AS BIGINT)) AS e3
  FROM embeddings
),"""
    + _KM_M.format(r=1, src="kmv")
    + ","
    + _KM_M.format(r=2, src="assigned1")
    + """
SELECT vec_id, cl AS assigned_label, dist AS dist_e6 FROM assigned2
"""
)


# r6c: TPC-H Q5 shape — local-supplier revenue per (region, nation).
TPCH_Q5_SQL = """
SELECT r.r_name, n.n_name,
       CAST(SUM(CAST(floor(1000000 * l.l_extendedprice * (1 - l.l_discount))
                AS BIGINT)) AS BIGINT) AS revenue_e6,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
              AND s.s_nationkey = c.c_nationkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY r.r_name, n.n_name
"""

RELATIONAL_SQL["tpch_q5"] = TPCH_Q5_SQL


# r6e: SCD Type-2 history from the events change stream.
SCD2_USER_STATE_SQL = """
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
), r AS (
  SELECT *, CAST(sum(CASE WHEN prev_type IS NULL
                               OR prev_type <> event_type THEN 1 ELSE 0 END)
       OVER (PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
  FROM e
), runs AS (
  SELECT user_id, run_id, min(event_type) AS state,
         min(ts_us) AS valid_from_us, CAST(count(*) AS BIGINT) AS n_events
  FROM r GROUP BY 1, 2
)
SELECT user_id, run_id, state, valid_from_us,
  coalesce(lead(valid_from_us)
             OVER (PARTITION BY user_id ORDER BY run_id), -1) AS valid_to_us,
  n_events,
  CAST(CASE WHEN lead(valid_from_us)
              OVER (PARTITION BY user_id ORDER BY run_id) IS NULL
       THEN 1 ELSE 0 END AS INT) AS is_current
FROM runs
"""

# r6e: per-entity provenance summary (spindle-style proxy audit record).
ENTITY_PROVENANCE_SQL = f"""
{_KG_CTES}
SELECT e.entity_id,
       CAST(count(*) AS BIGINT) AS n_mentions,
       CAST(count(DISTINCT mm.doc_id) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT mm.source) AS BIGINT) AS n_sources,
       CAST(min(mm.doc_id) AS BIGINT) AS first_doc,
       CAST(max(mm.doc_id) AS BIGINT) AS last_doc
FROM mm JOIN eids e ON e.label = mm.root
GROUP BY 1
"""


# r6e: winnowing (MOSS) fingerprint selection + verbatim-overlap pairs.
DEDUP_WINNOW_SQL = f"""
WITH dtok AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
posed AS (
  SELECT doc_id,
         unnest(generate_series(1, greatest(len(toks) - 2, 1))) AS pos,
         toks
  FROM dtok
),
pc AS (
  SELECT doc_id, pos,
         (({_TC_NULL.format(t='toks[pos]')} * 31
           + {_TC_NULL.format(t='toks[pos+1]')}) * 31
           + {_TC_NULL.format(t='toks[pos+2]')}) % {G.FP_MOD} AS code
  FROM posed
),
sel AS (
  SELECT doc_id, pos, code,
         min(code) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN {G.WINNOW_W - 1} PRECEDING AND CURRENT ROW) AS wmin
  FROM pc
),
fps AS MATERIALIZED (
  SELECT DISTINCT doc_id, code FROM sel
  WHERE pos >= {G.WINNOW_W} AND code = wmin
),
keep AS MATERIALIZED (
  SELECT code FROM fps GROUP BY code
  HAVING count(*) BETWEEN 2 AND {G.WINNOW_MAX_DF}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM fps a
JOIN keep k ON k.code = a.code
JOIN fps b ON b.code = a.code AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


# r6e: VoID dataset descriptor over the distinct triple set.
KG_VOID_SUMMARY_SQL = f"""
{_KG_CTES},
trip AS (SELECT DISTINCT s, p, o FROM {_QUADS_UNION})
SELECT CAST(count(*) AS BIGINT) AS n_triples,
       CAST(count(DISTINCT s) AS BIGINT) AS n_subjects,
       CAST(count(DISTINCT p) AS BIGINT) AS n_predicates,
       CAST(count(DISTINCT o) AS BIGINT) AS n_objects,
       CAST(count(DISTINCT CASE WHEN p = '{G.P_TYPE}' THEN o END)
            AS BIGINT) AS n_classes,
       CAST(count(DISTINCT CASE WHEN s LIKE '{G.ENTITY_IRI_PREFIX}%'
                           THEN s END) AS BIGINT) AS n_entities
FROM trip
"""


# r6e: per-graph canonical content hash — BIT_XOR of the charcode
# rolling hash of each distinct quad's canonical string.
KG_GRAPH_HASH_SQL = f"""
{_KG_CTES},
dq AS (
  SELECT DISTINCT g, s, p, o, o_kind, o_lang, o_datatype
  FROM {_QUADS_UNION}
),
hq AS (
  SELECT g,
         {_CHARCODE.format(col="concat_ws('|', g, s, p, o, o_kind,"
                               " coalesce(o_lang, ''),"
                               " coalesce(o_datatype, ''))")} AS h
  FROM dq
)
SELECT g, CAST(count(*) AS BIGINT) AS n_quads,
       CAST(bit_xor(h) AS BIGINT) AS graph_hash
FROM hq GROUP BY g
"""


# r6e: bounded-lookback EWMA — 8 power-of-two taps, integer DIV.
_EWMA_NUM = " + ".join(
    f"COALESCE(lag(v, {k}) OVER w * {1 << (7 - k)}, 0)" if k else
    f"v * {1 << 7}"
    for k in range(8)
)
_EWMA_DEN = " + ".join(
    f"CASE WHEN lag(v, {k}) OVER w IS NOT NULL THEN {1 << (7 - k)}"
    " ELSE 0 END" if k else f"{1 << 7}"
    for k in range(8)
)
RELATIONAL_SQL["event_ewma"] = f"""
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, {_e6('value')} AS v
  FROM events
),
t AS (
  SELECT user_id, event_id,
         CAST({_EWMA_NUM} AS BIGINT) AS num,
         CAST({_EWMA_DEN} AS BIGINT) AS den
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
)
SELECT user_id, event_id, CAST(num // den AS BIGINT) AS ewma_e6 FROM t
"""


# r6e: TPC-H Q4 shape — late-lineitem EXISTS per order priority.
RELATIONAL_SQL["tpch_q4"] = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE epoch_us(o_orderdate) >= 820454400000000
  AND epoch_us(o_orderdate) < 828316800000000
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND epoch_us(l.l_shipdate)
          > epoch_us(o.o_orderdate) + CAST(5184000000000 AS BIGINT)
  )
GROUP BY o_orderpriority
"""


# r6e: Z-order (Morton) export layout key — 4+4 bit interleave.
_Z_BITS = " + ".join(
    f"(((len_b >> {k}) & 1) * {1 << (2 * k + 1)})"
    f" + (((lang_b >> {k}) & 1) * {1 << (2 * k)})"
    for k in range(4)
)
RELATIONAL_SQL["doc_zorder_key"] = f"""
WITH base AS (
  SELECT doc_id,
         CAST({_CHARCODE.format(col='lang')} % 16 AS BIGINT) AS lang_b,
         CAST(least(length(bin(n_chars)), 15) AS BIGINT) AS len_b
  FROM documents
)
SELECT doc_id, lang_b, len_b, CAST({_Z_BITS} AS BIGINT) AS zkey FROM base
"""


# r6e: product-quantization codes — per-subspace label centroids on
# the e3 grid, nearest-centroid assignment, exact integer sq error.
EMBEDDING_PQ_CODES_SQL = """
WITH v AS (
  SELECT vec_id, label,
         list_transform(embedding,
           x -> CAST(round(1000 * CAST(x AS DOUBLE)) AS BIGINT)) AS e3
  FROM embeddings
),
ex AS (
  SELECT label, d - 1 AS dim, e3[d] AS val
  FROM v, UNNEST(generate_series(1, len(e3))) AS t(d)
),
cent AS (
  SELECT label, dim,
         CAST(CASE WHEN SUM(val) >= 0 THEN SUM(val) // COUNT(*)
                   ELSE -((-SUM(val)) // COUNT(*)) END AS BIGINT) AS mean_e3
  FROM ex GROUP BY label, dim
),
cent_arr AS (
  SELECT label AS c_label, dim // 16 AS m,
         list(mean_e3 ORDER BY dim) AS cent
  FROM cent GROUP BY 1, 2
),
sub AS (
  SELECT vec_id, m,
         list_transform(generate_series(1, 16),
                        i -> e3[m * 16 + i]) AS sub
  FROM v, UNNEST(generate_series(0, 3)) AS t(m)
),
scored AS (
  SELECT s.vec_id, s.m, c.c_label,
         CAST(list_sum(list_transform(generate_series(1, 16),
              i -> (s.sub[i] - c.cent[i]) * (s.sub[i] - c.cent[i])))
           AS BIGINT) AS dist
  FROM sub s JOIN cent_arr c ON c.m = s.m
),
sel AS (
  SELECT vec_id, m, MIN(dist) AS sq_err FROM scored GROUP BY 1, 2
)
SELECT s.vec_id, CAST(s.m AS INT) AS subspace,
       CAST(MIN(sc.c_label) AS INT) AS code,
       CAST(s.sq_err AS BIGINT) AS sq_err
FROM sel s
JOIN scored sc ON sc.vec_id = s.vec_id AND sc.m = s.m
              AND sc.dist = s.sq_err
GROUP BY s.vec_id, s.m, s.sq_err
"""


# r6e: TPC-H Q14 shape — promo revenue share, integer e6 share form.
RELATIONAL_SQL["tpch_q14"] = """
WITH j AS (
  SELECT CAST(floor(1000000 * l_extendedprice * (1 - l_discount))
              AS BIGINT) AS rev_e6,
         p_type
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE epoch_us(l.l_shipdate) >= 825638400000000
    AND epoch_us(l.l_shipdate) < 828316800000000
),
a AS (
  SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_e6 ELSE 0 END)
              AS BIGINT) AS promo_rev_e6,
         CAST(sum(rev_e6) AS BIGINT) AS total_rev_e6
  FROM j
)
SELECT promo_rev_e6, total_rev_e6,
       CAST(promo_rev_e6 // (total_rev_e6 // 1000000) AS BIGINT)
         AS promo_share_e6
FROM a
"""


# r6e: TPC-H Q19 shape — OR-of-conjunctions join predicate.
RELATIONAL_SQL["tpch_q19"] = """
SELECT CAST(sum(CAST(floor(1000000 * l_extendedprice * (1 - l_discount))
                     AS BIGINT)) AS BIGINT) AS revenue_e6,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


# r6e: CDC MERGE end state — (base \ retracts) ∪ adds over nation.
KG_STORE_MERGE_SQL = """
WITH base AS (
  SELECT 'ex:reg' || CAST(n_regionkey AS VARCHAR) AS g,
         'ex:nat' || CAST(n_nationkey AS VARCHAR) AS s,
         'ex:name' AS p, n_name AS o, n_nationkey AS k
  FROM nation
),
kept AS (SELECT g, s, p, o FROM base WHERE k % 2 = 1),
adds AS (
  SELECT 'ex:reg' || CAST(n_regionkey AS VARCHAR) AS g,
         'ex:nat' || CAST(n_nationkey AS VARCHAR) AS s,
         'ex:upd' AS p, 'v' || CAST(n_nationkey AS VARCHAR) AS o
  FROM nation WHERE n_nationkey % 5 = 0
  UNION ALL
  SELECT 'ex:regnew', 'ex:meta', 'ex:created', 'true'
)
SELECT DISTINCT g, s, p, o FROM (
  SELECT * FROM kept UNION ALL SELECT * FROM adds
)
"""


# r6e: component-size histogram over the sameAs closure (component
# size = reach count incl. self; bucket = bitlen(size)).
KG_COMPONENT_SIZE_HIST_SQL = f"""
{_KG_CTES},
tri AS (SELECT DISTINCT s, p, o FROM {_QUADS_UNION}),
sa_edges AS (
  SELECT s AS a, o AS b FROM tri WHERE p = 'owl:sameAs'
  UNION
  SELECT o AS a, s AS b FROM tri WHERE p = 'owl:sameAs'
),
sa_reach AS (
  SELECT a, b FROM sa_edges
  UNION
  SELECT r.a, e.b FROM sa_reach r JOIN sa_edges e ON e.a = r.b
),
comp AS (
  SELECT a AS node, MIN(b) AS root
  FROM (SELECT a, b FROM sa_reach UNION SELECT a, a FROM sa_edges)
  GROUP BY a
),
sizes AS (SELECT root, count(*) AS sz FROM comp GROUP BY root)
SELECT CAST(length(bin(sz)) AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_components,
       CAST(sum(sz) AS BIGINT) AS n_nodes
FROM sizes GROUP BY 1
"""


# r6e: k-NN graph — same-cell top-3 neighbors for EVERY vector.
EMBEDDING_KNN_GRAPH_SQL = """
SELECT query_id, neighbor_id, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                           c.embedding::DOUBLE[]) DESC,
                    c.vec_id ASC) AS rank
  FROM embeddings q JOIN embeddings c
    ON c.vec_id != q.vec_id AND c.label = q.label
) WHERE rank <= 3
"""


# r6e: FULL OUTER JOIN of two pre-aggregated per-nation counts.
RELATIONAL_SQL["nation_coverage_full_join"] = """
WITH cust AS (
  SELECT c_nationkey AS nationkey, count(*) AS n_customers
  FROM customer GROUP BY 1
),
supp AS (
  SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
  FROM supplier GROUP BY 1
)
SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
       CAST(COALESCE(n_customers, 0) AS BIGINT) AS n_customers,
       CAST(COALESCE(n_suppliers, 0) AS BIGINT) AS n_suppliers
FROM cust c FULL OUTER JOIN supp s ON c.nationkey = s.nationkey
"""


# r6e: scalar-subquery shape — integer-exact global mean cut.
RELATIONAL_SQL["orders_above_avg"] = f"""
WITH o AS (
  SELECT o_orderpriority, {_e6('o_totalprice')} AS tp_e6 FROM orders
),
a AS (SELECT CAST(sum(tp_e6) // count(*) AS BIGINT) AS avg_e6 FROM o)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(tp_e6) AS BIGINT) AS sum_price_e6
FROM o, a WHERE tp_e6 > avg_e6
GROUP BY o_orderpriority
"""


# r6e: per-day trending top-3 event types.
RELATIONAL_SQL["event_trending_daily"] = """
WITH daily AS (
  SELECT epoch_us(ts) // 86400000000 AS day, event_type,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT CAST(day AS BIGINT) AS day, event_type, n, CAST(rank AS INT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY day
                               ORDER BY n DESC, event_type ASC) AS rank
  FROM daily
) WHERE rank <= 3
"""


# r6e: integer-exact percent_rank per event type.
RELATIONAL_SQL["event_value_pctrank"] = f"""
WITH ev AS (
  SELECT event_type, event_id, {_e6('value')} AS v_e6 FROM events
),
rk AS (
  SELECT event_type, event_id,
         rank() OVER (PARTITION BY event_type ORDER BY v_e6) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM ev
)
SELECT event_type, event_id,
       CAST(CASE WHEN n = 1 THEN 0
                 ELSE (rk - 1) * 1000000 // (n - 1) END AS BIGINT)
         AS pctrank_e6
FROM rk
"""


# r6e: anti-entropy diff statuses, derived from the nation table.
KG_STORE_DIFF_SQL = """
WITH regs AS (SELECT DISTINCT n_regionkey AS r FROM nation)
SELECT 'ex:reg' || CAST(r AS VARCHAR) AS g,
       CASE WHEN r = 1 THEN 'only_a'
            WHEN r = 3 THEN 'changed'
            ELSE 'equal' END AS status
FROM regs
UNION ALL
SELECT 'ex:regnew', 'only_b'
"""


# r6e: UNPIVOT of the wide per-type stats row.
RELATIONAL_SQL["event_stats_unpivot"] = f"""
WITH wide AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum({_e6('value')}) AS BIGINT) AS sum_e6,
         CAST(min({_e6('value')}) AS BIGINT) AS min_e6,
         CAST(max({_e6('value')}) AS BIGINT) AS max_e6
  FROM events GROUP BY 1
)
SELECT event_type, 'n_events' AS metric, n_events AS value_e6 FROM wide
UNION ALL
SELECT event_type, 'sum_e6', sum_e6 FROM wide
UNION ALL
SELECT event_type, 'min_e6', min_e6 FROM wide
UNION ALL
SELECT event_type, 'max_e6', max_e6 FROM wide
"""


# r6e: NTILE(4) price quartiles with unique-key tie-break.
RELATIONAL_SQL["part_price_quartiles"] = f"""
WITH p AS (
  SELECT p_partkey, {_e6('p_retailprice')} AS price_e6 FROM part
),
t AS (
  SELECT price_e6,
         ntile(4) OVER (ORDER BY price_e6, p_partkey) AS quartile
  FROM p
)
SELECT CAST(quartile AS INT) AS quartile,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(min(price_e6) AS BIGINT) AS min_price_e6,
       CAST(max(price_e6) AS BIGINT) AS max_price_e6
FROM t GROUP BY 1
"""


# r6e: ratio-to-report — per-priority revenue share of total.
RELATIONAL_SQL["priority_revenue_share"] = f"""
WITH grp AS (
  SELECT o_orderpriority,
         CAST(sum({_e6('o_totalprice')}) AS BIGINT) AS rev_e6
  FROM orders GROUP BY 1
)
SELECT o_orderpriority, rev_e6,
       CAST(rev_e6 // (sum(rev_e6) OVER () // 1000000) AS BIGINT)
         AS share_e6
FROM grp
"""


# r6e: explicit GROUPING SETS ((nation), (priority)) in one pass.
RELATIONAL_SQL["revenue_grouping_sets"] = f"""
WITH j AS (
  SELECT n_name, o_orderpriority, {_e6('o_totalprice')} AS tp_e6
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
)
SELECT n_name, o_orderpriority,
       CAST(grouping(n_name) AS INT) AS g_nation,
       CAST(grouping(o_orderpriority) AS INT) AS g_priority,
       CAST(sum(tp_e6) AS BIGINT) AS rev_e6,
       CAST(count(*) AS BIGINT) AS n_orders
FROM j
GROUP BY GROUPING SETS ((n_name), (o_orderpriority))
"""


# r6e: ingest parse-error stats — the parser must drop EXACTLY the
# corrupted every-7th-key lines.
KG_PARSE_ERROR_STATS_SQL = """
WITH c AS (
  SELECT CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(CASE WHEN n_nationkey % 7 != 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_parsed
  FROM nation
)
SELECT n_lines, n_parsed,
       CAST(n_lines - n_parsed AS BIGINT) AS n_dropped,
       CAST((n_lines - n_parsed) * 1000000 // n_lines AS BIGINT)
         AS drop_rate_e6
FROM c
"""


# r6e: integer log-domain behavioral diversity per user.
RELATIONAL_SQL["user_event_diversity"] = """
WITH cnt AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT user_id, CAST(sum(cnt) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS n_types
  FROM cnt GROUP BY 1
)
SELECT c.user_id,
       CAST(min(t.n_types) AS BIGINT) AS n_types,
       CAST(min(t.total) AS BIGINT) AS n_events,
       CAST(sum(c.cnt * length(bin(t.total // c.cnt))) AS BIGINT)
         AS diversity_bits
FROM cnt c JOIN tot t ON t.user_id = c.user_id
GROUP BY c.user_id
"""


# r6e: per-dimension feature statistics on the e3 grid.
EMBEDDING_DIM_STATS_SQL = """
WITH v AS (
  SELECT list_transform(embedding,
           x -> CAST(round(1000 * CAST(x AS DOUBLE)) AS BIGINT)) AS e3
  FROM embeddings
),
ex AS (
  SELECT d - 1 AS dim, e3[d] AS x
  FROM v, UNNEST(generate_series(1, len(e3))) AS t(d)
)
SELECT CAST(dim AS INT) AS dim,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(x) AS BIGINT) AS sum_e3,
       CAST(sum(x * x) AS BIGINT) AS sum_sq_e6,
       CAST(CASE WHEN sum(x) >= 0 THEN sum(x) // count(*)
                 ELSE -((-sum(x)) // count(*)) END AS BIGINT) AS mean_e3
FROM ex GROUP BY dim
"""


# r6e: hour-of-day seasonality profile.
RELATIONAL_SQL["event_hourly_seasonality"] = f"""
SELECT event_type,
       CAST((epoch_us(ts) // 3600000000) % 24 AS INT) AS hour,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum({_e6('value')}) AS BIGINT) AS sum_value_e6
FROM events GROUP BY 1, 2
"""


# r6e: per-predicate coverage of the property index.
KG_ATTR_COVERAGE_SQL = f"""
{_KG_CTES}, {PROPS_CTE}
, ecount AS (
  SELECT CAST(count(DISTINCT e.entity_id) AS BIGINT) AS n_entities
  FROM mm JOIN eids e ON e.label = mm.root
)
SELECT p.pred,
       CAST(count(DISTINCT p.entity_id) AS BIGINT) AS n_with_value,
       CAST(min(c.n_entities) AS BIGINT) AS n_entities,
       CAST(count(DISTINCT p.entity_id) * 1000000 // min(c.n_entities)
            AS BIGINT) AS coverage_e6
FROM eprops p CROSS JOIN ecount c
GROUP BY p.pred
"""


# r6e: month-over-month revenue growth, trunc-toward-zero sign-split.
RELATIONAL_SQL["orders_monthly_growth"] = f"""
WITH o AS (
  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
           AS month_idx,
         {_e6('o_totalprice')} AS tp_e6
  FROM orders
),
monthly AS (
  SELECT month_idx, CAST(sum(tp_e6) AS BIGINT) AS rev_e6
  FROM o GROUP BY 1
),
lagged AS (
  SELECT month_idx, rev_e6,
         lag(rev_e6) OVER (ORDER BY month_idx) AS prev_e6
  FROM monthly
)
SELECT month_idx, rev_e6,
       CAST(CASE WHEN prev_e6 IS NULL THEN NULL
                 WHEN rev_e6 >= prev_e6 THEN
                   (rev_e6 - prev_e6) // (prev_e6 // 1000000)
                 ELSE -((prev_e6 - rev_e6) // (prev_e6 // 1000000))
            END AS BIGINT) AS growth_e6
FROM lagged
"""


# r6e: near-name ambiguity (4-char label-prefix collisions) over the
# attrs index — exact-label collisions are structurally impossible.
KG_LABEL_COLLISIONS_SQL = f"""
{_KG_CTES}
SELECT substring(label, 1, 4) AS label_prefix,
       CAST(count(DISTINCT entity_id) AS BIGINT) AS n_entities
FROM attrs GROUP BY 1 HAVING count(DISTINCT entity_id) > 1
"""


# r6e: identical-prefix duplicate groups (charcode of first 200 chars).
RELATIONAL_SQL["doc_prefix_dup_groups"] = f"""
WITH pref AS (
  SELECT doc_id,
         {_CHARCODE.format(col='substring(text, 1, 200)')} AS pcode
  FROM documents
)
SELECT pcode, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS keeper_doc_id
FROM pref GROUP BY pcode HAVING count(*) > 1
"""
