"""client_data_ingester_spark — a PySpark-native analytics/ingestion engine.

Re-expresses the capabilities of the reference ``rnjane/client_data_ingester``
(a FastAPI + Postgres CSV-ingestion service) as an idiomatic Spark DataFrame
program, extended with large-scale LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing).

Design invariants (SURVEY.md §4/§6):
- every ingest is a constant number of Spark jobs regardless of row count
  (validate + write, one shuffle on ``(client_id, sku)``);
- no per-row Python loops; transformers are Column expressions so they stay
  inside whole-stage codegen;
- atomicity per file via versioned-snapshot tables (atomic pointer swap).
"""

__version__ = "0.1.0"
