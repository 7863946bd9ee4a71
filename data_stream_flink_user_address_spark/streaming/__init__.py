from .stateful_join import stateful_user_address_join, union_with_discriminator
from .sinks import KeyedUpsertSink, console_sink, upsert_foreach_batch

__all__ = [
    "stateful_user_address_join",
    "union_with_discriminator",
    "KeyedUpsertSink",
    "upsert_foreach_batch",
    "console_sink",
]
