"""boat_etl_pyspark_spark — a PySpark-native analytics engine.

A ground-up re-expression of the capabilities of the reference repo
``ndaniel/boat-etl-pyspark`` (surveyed in /root/repo/SURVEY.md) as an
idiomatic Spark DataFrame/SQL engine, plus the large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, streaming) the reference lacks.

Design rules (see SURVEY.md §4/§7):
  * declare logical plans with the DataFrame/SQL API; let Catalyst +
    AQE pick physical strategy — no hand-scheduling;
  * built-in ``pyspark.sql.functions`` in the hot path; Arrow-batched
    pandas UDFs only where built-ins can't express the semantics;
  * no driver-side collects except bounded summaries and scalar
    parameters;
  * every operator ships with a DuckDB-oracle-checked query.
"""

__version__ = "0.1.0"
