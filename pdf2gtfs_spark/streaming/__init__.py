"""Structured Streaming skin over the extraction pipeline."""
