"""Misc utilities: visualization, torch-weight conversion, profiling."""
