from .scalar import (  # noqa: F401
    camel_to_kebab,
    fmt_bytes,
    parse_region_name,
    sub_ts_ms,
    to_string_binary,
)
from .cellmath import (  # noqa: F401
    sum_cells_per_result,
    sum_child_cells,
    zip_actions_results,
)
