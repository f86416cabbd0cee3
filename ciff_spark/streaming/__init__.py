"""Structured Streaming extensions: incremental index maintenance and
windowed event aggregation. The reference is strictly batch (SURVEY §2.H);
these are the post-v1 streaming surface built on the same index layout."""
