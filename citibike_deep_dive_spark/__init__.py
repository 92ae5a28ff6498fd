"""citibike_deep_dive_spark — a PySpark-native analytics engine.

A from-scratch Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline gabrielAHN/Citibike-Deep-Dive
(an incremental Citibike → DuckDB batch ETL), extended with the operators a
large-scale training-data pipeline needs (dedup, similarity search,
multimodal columns, text analysis).

Design principles (see SURVEY.md §7):
- DataFrame/SQL declarative plans; Catalyst does the optimizing.
- No collect-loops: the reference's driver-side Python post-processing
  (fetchall → dict-merge → executemany) becomes native Column expressions
  over MapType/ArrayType columns.
- Upserts (DuckDB ``UPDATE ... FROM`` + anti-join INSERT) become a single
  full-outer-join merge + table rewrite.
- Small merge sides are broadcast; fact tables partition by (year, month)
  standing in for the reference's secondary index.
"""

__version__ = "0.1.0"
