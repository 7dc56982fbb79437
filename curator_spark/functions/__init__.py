"""Scalar/column helper functions (native Spark expressions)."""
