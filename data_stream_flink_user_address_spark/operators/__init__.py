from .join import user_address_snapshot
from .windows import count_by_dimension, explode_addresses, tumbling_window_count

__all__ = [
    "user_address_snapshot",
    "explode_addresses",
    "count_by_dimension",
    "tumbling_window_count",
]
