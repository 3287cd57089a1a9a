"""Utilities: stats reporting, timing, profiling."""
