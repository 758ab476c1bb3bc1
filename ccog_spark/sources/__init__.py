"""Sources: schema-explicit scans (parquet/CSV/JSON) and raster ingest."""
