"""PySpark-native analytics engine with the query / data-processing
capabilities of the reference `music-streaming-services-etl-pipeline-with-airflow`
(Andrew-Marfo, snapshot 2025-03-21), rebuilt Spark-first.

Layout
------
- ``session``    — tuned SparkSession factory (AQE, UTC, broadcast, shuffle sizing)
- ``schemas``    — explicit StructTypes for every table (reference + testdata)
- ``sources``    — readers: parquet testdata, multi-file CSV, JDBC options
- ``sinks``      — writers: partitioned parquet warehouse, CSV, JDBC batch
- ``operators``  — pure DataFrame→DataFrame transforms, one module per family
                   (kpis, validate, dedup, similarity, text, multimodal)
- ``functions``  — reusable column expressions (datetime, hashing, vectors)
- ``plans``      — end-to-end pipelines and the SQL query surface (Q1-Q7)
- ``streaming``  — Structured Streaming variants (event-time windows, watermark)

Everything is lazy DataFrame composition; no row-at-a-time Python UDFs on
hot paths (Pandas UDFs only where built-ins cannot express the semantics,
e.g. multimodal decode).
"""

__version__ = "0.1.0"
