"""Driver-facing operators: each module exposes ``QUERIES`` mapping
``name -> (spark_fn, oracle_sql | None)`` where ``spark_fn(spark, sf_dir)``
returns a DataFrame and ``oracle_sql`` is the DuckDB-equivalent SQL over the
pre-registered testdata views. Column names/aliases match exactly on both
sides (the driver hashes values under sorted column names)."""
