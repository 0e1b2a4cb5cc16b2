"""Operators: pyramid build, spatial joins, kNN, dedup, similarity, rasterize."""
