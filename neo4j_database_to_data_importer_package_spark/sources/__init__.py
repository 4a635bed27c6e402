from .star_schema import (  # noqa: F401
    EdgeSpec,
    GraphView,
    NodeSpec,
    TPCH_GRAPH_SPEC,
    load_graph_view,
)
