"""Vectorized pandas-UDF wrappers + JVM-side Column-expression builders."""
