"""Structured Streaming operators (event streams)."""
