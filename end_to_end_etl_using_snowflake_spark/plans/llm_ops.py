"""LLM-training-data pipeline operators (dedup family, similarity
search, text analysis, multimodal) registered as driver queries over the
``documents`` / ``embeddings`` tables. Populated incrementally."""

from __future__ import annotations
