"""Scalar/array function helpers built on pyspark.sql.functions.

Everything here stays JVM-side (higher-order array functions, hash
functions, string ops) — no Python UDFs in hot paths.
"""
