from .pipeline import build_tables, correlate, scanner_enrich, finalize_and_route  # noqa: F401
