"""Custom batch sources (Spark 4 Python DataSource API)."""
