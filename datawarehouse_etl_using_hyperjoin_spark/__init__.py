"""PySpark-native analytics engine with the capabilities of
MubashirZaidi1/DataWarehouse-ETL-using-HyperJoin.

The reference is a near-real-time retail DW ETL whose core is a
stream/master-data equi-join ("HyperJoin", MESHJOIN family; see
/root/reference/StreamGeneratorThread.java:104-149) feeding a star schema
(createDW.sql:2-98).  This package re-expresses those semantics Spark-first:

- ``sources``     fixture/parquet/JDBC readers + reference role-mapping views
- ``functions``   scalar cleansing/derivation helpers (JVM-side ``F.*`` only)
- ``operators``   batch operators: hyperjoin, star build, upsert, analytics,
                  dedup, similarity search, text analysis, multimodal plumbing
- ``streaming``   Structured Streaming pipeline (watermarked stream-static join,
                  foreachBatch keyed upsert)
- ``plans``       plan-inspection helpers (pushdown / broadcast assertions)
- ``queries``     the declared-query registry consumed by __spark_entry__.py

Everything is DataFrame/SQL first so Catalyst supplies pushdown, pruning,
join selection and AQE; Python UDFs appear only as Arrow-batched pandas UDFs
in explicitly-marked slow paths.
"""

__version__ = "0.1.0"
