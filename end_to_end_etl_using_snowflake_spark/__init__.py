"""PySpark-native analytics engine with the capabilities of
``jadesola98/End-to-End-ETL-using-snowflake``.

The reference is a Snowflake continuous-ingest ELT pipeline (CSV stage ->
raw -> dim/fact with pipes, CDC streams, and a task DAG; see
/root/reference/etl_script/*.sql). This package re-expresses that surface
Spark-first:

- ``session``     SparkSession builder with the engine's scale defaults
- ``sources``     CSV file-format ingest, COPY INTO manifest loader, pipes
- ``operators``   merge upsert (SCD-1), DML rewrites, dedup family, ANN,
                  text analysis, multimodal column plumbing
- ``functions``   scalar helpers: Snowflake-style casts, vector math,
                  system$ predicates
- ``plans``       catalog bootstrap + the driver-facing query inventory
- ``streaming``   engine-owned changelog (Snowflake STREAM analog) and the
                  task orchestrator (Snowflake TASK analog)
- ``pipelines``   the three reference entity pipelines (customer/item/order)

Everything is plain DataFrame/SQL on Parquet so Catalyst + AQE pick the
physical strategy; no RDDs, no custom Catalyst rules.
"""

__version__ = "0.1.0"
