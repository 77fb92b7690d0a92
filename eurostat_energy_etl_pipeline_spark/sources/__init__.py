"""Source adapters (JSON-stat dense cube, parquet warehouse)."""
