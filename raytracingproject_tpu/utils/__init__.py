"""Utilities: PPM IO, profiling, logging."""
