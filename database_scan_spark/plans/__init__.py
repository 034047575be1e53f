"""Multi-stage query plans (the reference's pipeline scripts, Spark-first)."""
