"""Input sources: testdata parquet loaders and the deterministic synthetic
transcript generator (the north-rule input table)."""
