"""Per-family suite modules; assembled by crypto_data_service_loader_spark.suite."""
