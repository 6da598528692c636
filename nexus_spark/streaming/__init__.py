"""Structured Streaming surface (events fixture)."""
