"""LLM-data-pipeline operators: text analysis, deduplication, similarity
search, multimodal plumbing — the beyond-the-reference surface a 100 TB
training-data pipeline needs (driver north star, BASELINE.json)."""
