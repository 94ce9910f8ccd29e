"""Sources: batch/streaming file listing and validated CSV ingestion."""
