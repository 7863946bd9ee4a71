"""Deterministic synthetic user/address generator.

Spark-native analog of the reference's Faker producer
(``user-generator.py:11-37``): N users, exactly ``addresses_per_user``
addresses each (reference pins 3 -- ``user-generator.py:27``), keyed the
same way (user.id / address.userId).  Unlike the reference this is
deterministic (seeded by row id) and fully distributed: generation is a
projection over ``spark.range`` -- no driver-side loop, scales to any N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FIRST_M = ["James", "John", "Robert", "Michael", "David"]
_FIRST_F = ["Mary", "Patricia", "Jennifer", "Linda", "Elizabeth"]
_FIRST_O = ["Alex", "Sam", "Jordan", "Taylor", "Casey"]
_LAST = ["Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia", "Miller"]
_STATES = ["Illinois", "Texas", "California", "Ohio", "Georgia", "Oregon"]
_COUNTRIES = ["Brazil", "Portugal", "Japan", "Canada", "France", "Mexico"]
_CITIES = ["Springfield", "Austin", "Fresno", "Akron", "Macon", "Salem"]


def _pick(options: list[str], key) -> F.Column:
    """Deterministic element pick: options[key % len] via chained when()."""
    n = len(options)
    idx = key % F.lit(n)
    expr = F.lit(options[0])
    for i in range(n - 1, 0, -1):
        expr = F.when(idx == i, F.lit(options[i])).otherwise(expr)
    return expr


def generate_users(spark: SparkSession, n: int = 10, seed: int = 42) -> DataFrame:
    """N users matching USER_SCHEMA. id is a deterministic UUID-shaped key."""
    base = spark.range(n).withColumn("k", (F.col("id") * 2654435761 + seed) % 2147483647)
    first = (
        F.when(F.col("genre") == "M", _pick(_FIRST_M, F.col("k")))
        .when(F.col("genre") == "F", _pick(_FIRST_F, F.col("k")))
        .otherwise(_pick(_FIRST_O, F.col("k")))
    )
    return (
        base.withColumn("genre", _pick(["M", "F", "O"], F.col("k")))
        .withColumn("first", first)
        .withColumn("last", _pick(_LAST, F.floor(F.col("k") / 3)))
        .select(
            F.md5(F.concat(F.lit("user-"), F.col("id").cast("string"), F.lit(f"-{seed}"))).alias("id"),
            F.concat_ws(" ", "first", "last").alias("name"),
            F.lower(F.concat_ws(".", "first", "last")).alias("email_local"),
            F.col("genre"),
            (F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(secs=F.col("k") % 86400)).alias(
                "registerDate"
            ),
        )
        .withColumn("email", F.concat(F.col("email_local"), F.lit("@example.com")))
        .drop("email_local")
        .select("id", "name", "email", "genre", "registerDate")
    )


def generate_addresses(
    spark: SparkSession, n_users: int = 10, addresses_per_user: int = 3, seed: int = 42
) -> DataFrame:
    """addresses_per_user rows per user key, matching ADDRESS_SCHEMA.

    Key derivation mirrors generate_users so the FK relationship holds
    (reference produces addresses keyed by the user's id --
    user-generator.py:65-71).
    """
    base = (
        spark.range(n_users * addresses_per_user)
        .withColumn("user_ord", F.floor(F.col("id") / addresses_per_user))
        .withColumn("k", (F.col("id") * 40503 + seed) % 2147483647)
    )
    return base.select(
        F.md5(F.concat(F.lit("user-"), F.col("user_ord").cast("string"), F.lit(f"-{seed}"))).alias("userId"),
        F.concat((F.col("k") % 9000 + 100).cast("string"), F.lit(" Main St")).alias("address"),
        _pick(_CITIES, F.col("k")).alias("city"),
        _pick(_STATES, F.floor(F.col("k") / 7)).alias("state"),
        F.lpad((F.col("k") % 100000).cast("string"), 5, "0").alias("zipCode"),
        _pick(_COUNTRIES, F.floor(F.col("k") / 11)).alias("country"),
    )
