"""Scalar/columnar helper functions (engine-internal, all JVM-side)."""
