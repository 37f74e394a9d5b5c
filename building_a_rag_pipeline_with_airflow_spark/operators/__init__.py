"""Distributed operators: chunking, dedup, similarity, tabular, retrieval."""
