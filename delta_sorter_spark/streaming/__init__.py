"""Structured Streaming operators (watermarked windowed aggregation over the
events stream, stateful dedup) — see ``events.py``."""
