"""Structured-streaming variants of the rollup layer."""
