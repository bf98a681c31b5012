"""Scalar/column function library (SURVEY.md §2.8).

Each function exists in two forms where needed:
- an exact pandas implementation used inside the Arrow kernel and in
  golden tests;
- a Spark Column expression built from ``pyspark.sql.functions`` only
  (JVM-side, codegen-friendly — no Python UDFs in the hot path).
"""
