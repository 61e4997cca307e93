"""Operator library — every data operation from SURVEY §2, Spark-first."""
