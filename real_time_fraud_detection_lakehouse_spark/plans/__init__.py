"""Logical-plan builders: silver/gold medallion, analytics views, relational queries."""
