"""Query library. Importing this package populates the registry."""

from .registry import QUERIES, Query, register  # noqa: F401
from . import events_queries  # noqa: F401
from . import tpch_queries  # noqa: F401

try:  # data-prep ops land incrementally; keep the registry importable
    from . import dataprep_queries  # noqa: F401
except ImportError:
    pass
try:
    from . import pipeline_queries  # noqa: F401
except ImportError:
    pass


def queries():
    return {name: q.fn for name, q in QUERIES.items()}


def oracles():
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
