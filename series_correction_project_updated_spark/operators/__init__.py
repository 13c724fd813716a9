"""Spark DataFrame operators."""
