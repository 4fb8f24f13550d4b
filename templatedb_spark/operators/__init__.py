"""Operators: relational surface (reference parity) + LLM-data-pipeline tier."""
