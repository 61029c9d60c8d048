from .pipeline import (  # noqa: F401
    build_tables,
    correlate,
    finalize,
    finalize_and_route,
    route,
    scanner_enrich,
)
