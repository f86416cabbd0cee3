"""Scalar/semantic function modules shared by the engine, the test oracle,
and the generated DuckDB oracle SQL (single source of truth for semantics)."""
