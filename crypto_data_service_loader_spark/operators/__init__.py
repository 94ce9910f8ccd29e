"""Operator library: pure ``DataFrame -> DataFrame`` functions.

Modules:
- registry:   the reference's control-plane operators (SURVEY.md §2A)
- relational: joins / aggregations / windows / sorts / set ops (§2B EXT)
- asof:       as-of join composite operator
- dedup:      exact + near-duplicate detection (LLM-pipeline EXT)
- similarity: embedding similarity search (LLM-pipeline EXT)
- text:       text analysis (LLM-pipeline EXT)
- multimodal: binary-column decode plumbing (LLM-pipeline EXT, stubbed codecs)
"""
