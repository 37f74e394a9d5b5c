"""Structured Streaming surface (SURVEY §2.10 — north-star requirement)."""
