"""Expression-level helpers: typed predicate rendering, sort-key columns,
portable hashing, and text-analysis expressions.  Everything here returns
either strings (SQL fragments) or ``pyspark.sql.Column`` objects so the hot
path stays JVM-side inside whole-stage codegen."""
