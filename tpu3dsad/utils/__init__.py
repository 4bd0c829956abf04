"""Utilities: weight import, dumping, profiling."""
