"""Plan-level building blocks: scalable dense ranking, shard assignment."""
