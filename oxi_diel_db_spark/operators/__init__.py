"""Composed operators the engine ships that Spark lacks as single
primitives (SURVEY.md §4.2 'custom needed' rows): as-of join, the
dedup family, ANN similarity search, multimodal column plumbing."""
