"""Warehouse load job (reference etl/main.py) on a parquet warehouse."""
