"""Pallas TPU kernels for the perf-critical stages (SURVEY.md §7.5)."""
