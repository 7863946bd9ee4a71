"""PySpark-native analytics engine with the query and data-processing
capabilities of ``henriquevalentim/data-stream-flink-user-address``.

The reference is a Flink 1.18 DataStream job (Kafka JSON sources -> keyed
stateful user/address join -> tumbling 1-minute windowed counts -> MongoDB
keyed upserts).  This package re-expresses those capabilities Spark-first:

- ``schemas``    explicit StructTypes for the wire model (User/Address/
                 UserAddress -- reference Dto/User.java, Dto/Address.java,
                 Dto/UserAddress.java)
- ``sources``    batch + streaming readers (parquet/json/csv/kafka-shaped),
                 JSON decode (reference Deserializer/*.java), synthetic
                 generator (reference user-generator.py)
- ``operators``  batch relational core: final-snapshot join, tumbling-window
                 counts (reference Main.java:136-167), dedup / similarity /
                 text-analysis extensions
- ``streaming``  stateful emit-per-event join (reference Main.java:78-133),
                 keyed upsert sinks (reference Sink/MongoSink.java),
                 full-topology pipeline (reference Main.java:45-183)
- ``functions``  scalar/column function library (text analysis, fingerprints,
                 vector math)

Everything relational rides Catalyst; the only imperative operator code is
the stateful join (applyInPandasWithState) and the upsert sink
(foreachBatch).  Designed for horizontal scale: no driver-side collection,
no parallelism-1 stages (the reference's ``windowAll`` is deliberately
re-expressed as a parallel window+dimension grouped aggregation).
"""

__version__ = "0.1.0"
