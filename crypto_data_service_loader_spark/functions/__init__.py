"""Scalar function helpers + driver-side utilities (retry, timing)."""
