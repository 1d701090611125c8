"""Canonical data core: parquet index, bbox math, splits, exporters, pipeline."""
