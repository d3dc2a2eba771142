"""PySpark-native analytics engine with the query/data-processing
capabilities of Brenezes/HubSit-Health-Analytics-ETL.

The reference (/root/reference) is a single-machine eager pandas ETL
(src/etl_pipeline.py) plus one upstream PySpark pseudonymization job
(src/Criptografia.py). This package re-expresses every operator it
implements (SURVEY.md §2) as schema-agnostic, distributed-safe PySpark
DataFrame builders, and extends them with the large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, time windows) the reference lacks.

Design stance (SURVEY.md §7.0):
- DataFrame API everywhere; zero row-at-a-time Python UDFs in the core.
- All "now"-dependent logic takes an explicit ``as_of`` literal.
- Every operator is registered as a named query in ``__spark_entry__``
  with a DuckDB oracle twin.
"""

__version__ = "0.1.0"
