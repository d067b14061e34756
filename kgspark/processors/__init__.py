"""Processor registry — the Spark analogue of Twine's plugin system
(`twine_plugin_register(mime, name, fn)`, libtwine/plugins.c `[U]`,
SURVEY.md O44).

Each processor is a ``mapInPandas`` kernel: an
``Iterator[pd.DataFrame] -> Iterator[pd.DataFrame]`` generator over
Arrow batches with a declared output schema.  Kernels must use only
vectorized pandas/numpy ops — per-row Python is banned
(BASELINE.json:15).

Dispatch (O15): the extract stage filters the flat span table by
``kind`` and routes each sub-frame to its registered kernel; unknown
kinds land in the quarantine side-output (the MQ-reject analogue).
"""

from __future__ import annotations

from .media import media_feature_kernel
from .text import text_mention_kernel
from .xml import xml_transform_kernel

# kind -> (kernel, output schema name) — see extract.py for usage.
PROCESSORS = {
    "text": text_mention_kernel,
    "media": media_feature_kernel,
    "xml": xml_transform_kernel,      # O12 XSLT-analogue template transform
}

KNOWN_KINDS = sorted(PROCESSORS)
