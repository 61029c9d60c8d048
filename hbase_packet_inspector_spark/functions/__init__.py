from .scalar import (  # noqa: F401
    camel_to_kebab,
    fmt_bytes,
    parse_region_name,
    sub_ts_ms,
    to_string_binary,
)
from .cellmath import (  # noqa: F401
    batch_cells_rollup,
    sum_cells_per_result,
    zip_actions_results,
)
