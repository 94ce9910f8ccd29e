"""crypto_data_service_loader_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ETL service emelyanovkr/crypto-data-service-loader (see SURVEY.md),
re-expressed Spark-first:

- declarative DataFrame/SQL logical plans (Catalyst/Tungsten pick physical),
- Structured Streaming for the discovery/ingest control loop,
- pure ``DataFrame -> DataFrame`` operator functions so every operator is
  independently testable and oracle-checkable,
- LLM-training-data-pipeline extensions (dedup, similarity search, text
  analysis, multimodal plumbing) designed for 100 TB scale.
"""

__version__ = "0.1.0"
