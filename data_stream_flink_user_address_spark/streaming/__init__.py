from .stateful_join import (
    batch_emission_trace,
    stateful_user_address_join,
    union_with_discriminator,
)
from .sinks import KeyedUpsertSink, console_sink, upsert_foreach_batch

__all__ = [
    "batch_emission_trace",
    "stateful_user_address_join",
    "union_with_discriminator",
    "KeyedUpsertSink",
    "upsert_foreach_batch",
    "console_sink",
]
