"""Streaming + batch pipelines composing the operators: discovery,
upload, status progression, cleanup — the four reference flows as one
linear, checkpointed pipeline (SURVEY.md §3 concurrency note)."""
