"""PySpark-native analytics engine with the query and data-processing
capabilities of ``ManojKasireddyUMD/Yelp-Business-Data-Pipeline``.

Brand-new, idiomatic DataFrame/Spark-SQL implementation — NOT a port of the
reference notebooks. The reference (see ``SURVEY.md``) defines WHAT each
operator computes; this package re-expresses those semantics as reusable,
testable, 100 TB-scale-minded Spark operators:

- ``session``       — SparkSession factory (AQE on, UTC, Arrow on)
- ``schemas``       — explicit StructTypes for raw Yelp JSON + testdata
- ``sources``       — readers (explicit-schema JSON/parquet/CSV) and writers
                      (idempotent append, dynamic-partition overwrite)
- ``operators``     — cleaning, business/review/user ETL, unified star join,
                      graph-as-DataFrames, top-k, dedup, similarity, text
- ``functions``     — sentiment lexicon scoring, hours parsing expressions
- ``plans``         — the oracle-backed query pack driving ``__spark_entry__``
- ``streaming``     — Structured Streaming file-source ingest (the Spark-native
                      replacement for the reference's S3→Lambda trigger)
"""

__version__ = "0.1.0"
