"""Structured Streaming wrappers for the wave loop."""
