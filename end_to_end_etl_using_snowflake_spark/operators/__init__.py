"""Engine operators: merge upsert, DML rewrites, dedup family, similarity
search, text analysis, multimodal column plumbing."""
