from .asof import asof_join
from .interval import interval_join
from .join import user_address_snapshot
from .scd2 import scd2_apply
from .skew import salted_count, salted_join
from .windows import (
    count_by_dimension,
    explode_addresses,
    session_window_count,
    sliding_window_count,
    tumbling_window_count,
    watermarked_window_count,
)

__all__ = [
    "asof_join",
    "interval_join",
    "user_address_snapshot",
    "scd2_apply",
    "salted_count",
    "salted_join",
    "explode_addresses",
    "count_by_dimension",
    "tumbling_window_count",
    "watermarked_window_count",
    "sliding_window_count",
    "session_window_count",
]
