"""Sources: deterministic synthetic page generation + parquet/csv/json readers."""
