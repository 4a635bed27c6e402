"""PySpark-native graph-export & analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference ``jexp/neo4j-database-to-data-importer-package`` (a Neo4j →
Data Importer exporter, surveyed in ``SURVEY.md``), re-expressed as
composable PySpark DataFrame operators designed for 100 TB scale:

- ``sources``    — graph views over columnar tables (star-schema → property graph)
- ``operators``  — schema inference, identifier detection, pattern discovery,
                   node/relationship export, dedup, similarity, text analysis,
                   windows, graph algorithms
- ``functions``  — scalar helpers (type inference, sentinels, hashing, text)
- ``plans``      — export orchestration + importer-model generation (3 versions)
- ``sinks``      — CSV (single-file compat / sharded native), zip packaging
- ``streaming``  — Structured Streaming variants of the batch operators
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
from .catalog import GraphCatalog  # noqa: F401
