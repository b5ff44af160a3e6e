"""Structured Streaming operators over the events table (X7)."""
