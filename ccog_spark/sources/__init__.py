"""Sources: schema-explicit scans (parquet/CSV/JSON/ORC), partitioned
writes + MERGE-style upsert, and raster ingest."""
