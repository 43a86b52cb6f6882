"""Structured Streaming operators and their batch-equivalent twins."""
