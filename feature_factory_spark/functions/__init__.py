from .expressions import (
    apply_value_mapping,
    cap_expr,
    cosine_expr,
    dot_expr,
    format_2dp,
    interval_case_expr,
    interval_label,
    mapping_case_expr,
    norm_expr,
    sanitize_category,
)
from .stats import (
    column_means,
    column_min_max,
    column_modes,
    column_quantiles,
)
