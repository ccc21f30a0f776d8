"""Table sources/sinks: a minimal Delta-protocol transaction log
(``delta_log``), a Spark-facing Delta table wrapper (``delta_table``), and
plain-parquet helpers for the driver's synthetic TPC-H-ish tables
(``tables``)."""
