"""Driver-level planning: file/partition inventory and rewrite work lists.
All metadata-only — no Spark jobs are launched from this package."""
