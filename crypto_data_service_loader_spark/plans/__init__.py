"""Plan introspection helpers — assertions about physical plans so tests
and bench can verify pushdown/broadcast/codegen, not just row values."""
