"""Query registry: every implemented operator exposed as a (Spark query,
DuckDB oracle SQL) pair for the driver's correctness gate.

Formerly one 6,900-line ``registry.py``; split per family (VERDICT r05
#7) with registration order preserved: ``_core`` owns the stores and
the ``@register`` decorator, each section module registers its
queries at import, and this package imports the sections in the
original file order so ``QUERIES``/``ORACLES`` iteration order is
unchanged. The public surface is identical: ``registry.QUERIES``,
``registry.ORACLES``, ``registry.register``, ``registry._view``."""

from __future__ import annotations

from ._core import (
    ORACLES,
    QUERIES,
    _dsum,
    _fmt_ts,
    _TS_FMT_DUCK,
    _TS_FMT_SPARK,
    _view,
    dsum,
    register,
)

# Import order = original registration order; do not reorder.
from . import exports_reference  # noqa: E402,F401
from . import tpch_analytics  # noqa: E402,F401
from . import event_windows  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import graph  # noqa: E402,F401
from . import events_multimodal  # noqa: E402,F401
from . import streaming  # noqa: E402,F401
from . import analytic_shapes  # noqa: E402,F401
from . import distributions  # noqa: E402,F401
from . import neardup_clusters  # noqa: E402,F401
from . import graph_traversal  # noqa: E402,F401
from . import r2_operators  # noqa: E402,F401
from . import tpch_full  # noqa: E402,F401
from . import training_pipeline  # noqa: E402,F401
from . import text_quality  # noqa: E402,F401
from . import mixing  # noqa: E402,F401
from . import timeseries_lm  # noqa: E402,F401
from . import r3_operators  # noqa: E402,F401
from . import r4_operators  # noqa: E402,F401
from . import r4b_operators  # noqa: E402,F401
from . import r5_operators  # noqa: E402,F401
from . import r6_operators  # noqa: E402,F401
from . import r6b_operators  # noqa: E402,F401
from . import r6c_operators  # noqa: E402,F401
from . import r6d_operators  # noqa: E402,F401
from . import r6e_operators  # noqa: E402,F401
from . import r6f_operators  # noqa: E402,F401
from . import r6g_operators  # noqa: E402,F401
from . import r6h_operators  # noqa: E402,F401
from . import r6i_operators  # noqa: E402,F401
from . import r6j_operators  # noqa: E402,F401
from . import r6k_operators  # noqa: E402,F401
from . import r6l_operators  # noqa: E402,F401
from . import r6m_operators  # noqa: E402,F401
from . import r6n_operators  # noqa: E402,F401
from . import r6o_operators  # noqa: E402,F401
from . import r6p_operators  # noqa: E402,F401
from . import r6q_operators  # noqa: E402,F401
from . import r6r_operators  # noqa: E402,F401
from . import r6s_operators  # noqa: E402,F401
from . import r6t_operators  # noqa: E402,F401
from . import r7_operators  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "register", "_view"]
