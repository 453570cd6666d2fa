"""Query operators. Each module exposes (spark, sf_dir) -> DataFrame
builders used by __spark_entry__.queries(), plus reusable pieces."""
