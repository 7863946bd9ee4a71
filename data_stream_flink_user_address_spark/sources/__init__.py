from .files import read_csv, read_json, read_parquet
from .json_decode import decode_address_json, decode_user_json, with_ingest_time
from .generator import generate_addresses, generate_users
from .kafka import kafka_json_stream
from .layout import compact, write_bucketed, write_partitioned

__all__ = [
    "read_parquet",
    "read_json",
    "read_csv",
    "decode_user_json",
    "decode_address_json",
    "with_ingest_time",
    "generate_users",
    "generate_addresses",
    "kafka_json_stream",
    "write_partitioned",
    "write_bucketed",
    "compact",
]
