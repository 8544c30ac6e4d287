"""DataFrame-level operators (joins, tessellation, kNN, tiles, dedup,
similarity, text analytics)."""
