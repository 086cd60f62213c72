"""football_etl_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference ETL pipeline (osegonte/football-etl,
surveyed in /root/repo/SURVEY.md) as an idiomatic Spark engine:

- every capability is a lazy DataFrame transform AND a SQL-visible
  expression, so Catalyst owns optimization and physical planning;
- zero row-at-a-time Python in the reference-parity surface (the
  reference's ``.apply``/``iterrows`` helpers compile to built-in
  Column expressions, see ``functions/``);
- operators are designed for 100 TB / multi-executor scale even
  though tests run on ``local[*]`` (broadcast dimensions, range
  windows instead of per-group loops, no driver-side collects in
  operator paths).

Layout:
  session     SparkSession factory with engine defaults
  schemas     explicit StructType registry (schema-on-read contract)
  io          table loaders / sinks (parquet, csv, json, partitioned)
  functions   scalar expression library (string/date/math/text/vector)
  operators   relational + extension operators (clean, dedup, window,
              join, aggregate, similarity, multimodal)
  plans       the query registry (Spark callable + DuckDB oracle SQL)
              and the five-stage reference pipeline
  streaming   incremental / Structured Streaming variants
"""

__version__ = "0.1.0"
