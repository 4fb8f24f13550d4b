"""Structured Streaming surface (extension tier — the reference has none)."""
