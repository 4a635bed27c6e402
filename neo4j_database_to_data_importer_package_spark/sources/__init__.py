from .base import (  # noqa: F401
    CONNECTOR_PIN,
    GraphSource,
    Neo4jConnectorSource,
    StarSchemaSource,
)
from .star_schema import (  # noqa: F401
    EdgeSpec,
    GraphView,
    NodeSpec,
    TPCH_GRAPH_SPEC,
    build_graph_view,
    load_graph_view,
)
