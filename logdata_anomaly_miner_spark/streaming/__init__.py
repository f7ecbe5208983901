"""Structured Streaming re-expressions of the stateful detector loop."""
