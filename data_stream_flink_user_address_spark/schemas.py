"""Explicit StructType schemas for the reference wire model.

The reference binds JSON by POJO field name (Jackson,
``Deserializer/UserDeserializationSchema.java:22-24``); missing fields
become null.  We mirror that with explicit StructTypes passed to
``from_json`` -- never schema inference (SURVEY.md SS1.3).

Wire timestamp format: ``%Y-%m-%dT%H:%M:%S.%f%z`` (ISO-8601 with
microseconds and offset -- reference ``user-generator.py:22``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# reference Dto/User.java:7-11
USER_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("email", T.StringType(), True),
        T.StructField("genre", T.StringType(), True),
        T.StructField("registerDate", T.TimestampType(), True),
    ]
)

# reference Dto/Address.java:6-11
ADDRESS_SCHEMA = T.StructType(
    [
        T.StructField("userId", T.StringType(), False),
        T.StructField("address", T.StringType(), True),
        T.StructField("city", T.StringType(), True),
        T.StructField("state", T.StringType(), True),
        T.StructField("zipCode", T.StringType(), True),
        T.StructField("country", T.StringType(), True),
    ]
)

# Address nested inside UserAddress drops userId
# (reference Dto/UserAddress.java:41-61: sink document shape).
ADDRESS_STRUCT = T.StructType(
    [
        T.StructField("address", T.StringType(), True),
        T.StructField("city", T.StringType(), True),
        T.StructField("state", T.StringType(), True),
        T.StructField("zipCode", T.StringType(), True),
        T.StructField("country", T.StringType(), True),
    ]
)

# reference Dto/UserAddress.java:7-14 with the sink's column renames
# (userId/userName/userEmail -- Dto/UserAddress.java:44-48).
USER_ADDRESS_SCHEMA = T.StructType(
    [
        T.StructField("userId", T.StringType(), False),
        T.StructField("userName", T.StringType(), True),
        T.StructField("userEmail", T.StringType(), True),
        T.StructField("genre", T.StringType(), True),
        T.StructField("registerDate", T.TimestampType(), True),
        T.StructField("addresses", T.ArrayType(ADDRESS_STRUCT), False),
    ]
)

# ISO-8601 with microseconds + numeric offset, e.g.
# 2026-08-13T10:15:30.123456+0000  (user-generator.py:22)
WIRE_TIMESTAMP_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSZ"

# Multimodal column convention: opaque payload + typed metadata
# (engine extension, not in the reference -- see functions/multimodal.py).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)
