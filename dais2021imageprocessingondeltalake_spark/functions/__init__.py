"""Scalar-function helpers and the Arrow-vectorized UDF surface."""
