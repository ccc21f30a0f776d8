"""Engine operators: validation, compaction, and the LLM-data-pipeline
extensions (dedup, similarity, text analysis, multimodal)."""
