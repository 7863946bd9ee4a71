"""Final-snapshot user/address join (batch analogue of the stateful join).

Reference semantics (``Main.java:78-133``, KeyedCoProcessFunction): the
user side drives (left-outer), addresses accumulate per key, users with
no addresses emit an empty list.  The batch/SQL analogue of the *final
snapshot* is ``users LEFT JOIN addresses`` + ``collect_list(struct(...))``
(SURVEY.md SS2.3); the per-event emission trace lives in
``streaming/stateful_join.py``.

Scale notes: the join shuffles both sides on the user key -- correct and
AQE-handled for skew.  ``collect_list`` per user is bounded by the
per-user address count (3 in the reference workload); at 100 TB this
stays a single-shuffle groupBy, never a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def user_address_snapshot(
    users: DataFrame,
    addresses: DataFrame,
    user_key: str = "id",
    address_key: str = "userId",
) -> DataFrame:
    """USER_ADDRESS_SCHEMA-shaped final snapshot.

    Column renames (userId/userName/userEmail) and the nested address
    struct field set (userId dropped) follow the reference sink document
    (``Dto/UserAddress.java:41-61``).  Empty address list -- not null --
    for address-less users (``Main.java:112-114``).
    """
    addr_struct = F.struct(
        F.col("address"), F.col("city"), F.col("state"), F.col("zipCode"), F.col("country")
    )
    # Aggregate addresses per key BEFORE the join: shrinks the join's
    # right side to one row per user key and keeps the join 1:1.
    addr_agg = (
        addresses.groupBy(F.col(address_key).alias("__addr_key"))
        .agg(F.collect_list(addr_struct).alias("addresses"))
    )
    joined = users.join(addr_agg, users[user_key] == addr_agg["__addr_key"], "left")
    return joined.select(
        users[user_key].alias("userId"),
        F.col("name").alias("userName"),
        F.col("email").alias("userEmail"),
        F.col("genre"),
        F.col("registerDate"),
        F.coalesce(
            F.col("addresses"),
            F.array().cast("array<struct<address:string,city:string,state:string,zipCode:string,country:string>>"),
        ).alias("addresses"),
    )
