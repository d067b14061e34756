"""XML → RDF template transform — the XSLT-processor slot (O12).

Twine's ``xslt/`` processor maps configured XML document types through
stylesheets into RDF/XML, which then feeds the normal RDF pipeline
(`xslt/` processor `[U~]`, SURVEY.md §2.2 O12).  The sandbox has no
libxslt, so this module keeps the CONTRACT — stylesheet = declarative
config, transform = pure function payload → statements — with a
template table standing in for the stylesheet: each template maps one
XML element to a predicate + term shape, and the kernel applies every
template to every payload in one vectorized pass per template (regex
subset of XPath: flat one-line elements, optional ``xml:lang``).

Output is the full D3 term model, so transformed triples drop straight
into the triple tables / serializers.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from ..rdfio import PARSED_DDL, _compact, _xml_unescape

# The "stylesheet": (element, predicate, o_kind, o_datatype).
XML_TEMPLATES = [
    ("title", "rdfs:label", "literal", ""),
    ("lang", "dc:language", "literal", ""),
    ("size", "ex:size", "literal", "xsd:integer"),
    ("link", "ex:mentions", "iri", ""),
]

_DOC_ID_RE = re.compile(r'^<doc id="([^"]*)">')


def xml_transform_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """One-line ``<doc id="...">…</doc>`` payloads in (column ``line``),
    full-term triples out; docs without an id and elements with no
    template are dropped (quarantine upstream, O15)."""
    for pdf in batches:
        if len(pdf) == 0:
            continue
        line = pdf["line"].astype("string").str.strip()
        sid = line.str.extract(_DOC_ID_RE)[0]
        keep = sid.notna()
        frames = []
        for el, pred, kind, dt in XML_TEMPLATES:
            ext = line.str.extract(
                rf'<{el}(?: xml:lang="([^"]*)")?>(.*?)</{el}>'
            )
            m = keep & ext[1].notna()
            if not m.any():
                continue
            o = _xml_unescape(ext.loc[m, 1])
            if kind == "iri":
                o = _compact(o)
            frames.append(
                pd.DataFrame(
                    {
                        "s": "doc://" + sid[m],
                        "p": pred,
                        "o": o,
                        "o_kind": kind,
                        "o_lang": ext.loc[m, 0].fillna(""),
                        "o_datatype": dt,
                    }
                )
            )
        if frames:
            yield pd.concat(frames, ignore_index=True)


XML_TRIPLES_DDL = PARSED_DDL
