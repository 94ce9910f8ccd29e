"""Sinks: local parquet default + ClickHouse JDBC adapter behind one
interface, so every pipeline runs hermetically on testdata."""
