"""Scalar/codec helpers."""
