from .tables import load_table, load_tables, TABLE_NAMES  # noqa: F401
