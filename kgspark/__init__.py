"""kgspark — a PySpark-native knowledge-graph construction engine.

Re-implements the capabilities of bbcarchdev/twine (RDF workflow engine:
per-MIME processor modules, spindle coreference/proxy generation, AMQP
queue + writerd write pipeline) as a DAG of Spark DataFrame stages:

    documents → spans → extract (mentions+triples) → link (LSH blocking
    + Jaccard/cosine scoring) → connected components → canonical
    entities → proxy-graph materialization, with per-partition
    checkpoint/lineage for idempotent resume.

See SURVEY.md for the operator-by-operator mapping (O1..O45) and the
upstream module citations.
"""

__version__ = "0.1.0"
