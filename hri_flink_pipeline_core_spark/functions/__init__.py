"""Column-level helper functions (pure pyspark.sql.functions compositions —
JVM-side, codegen-friendly; no Python UDFs in the hot path)."""
