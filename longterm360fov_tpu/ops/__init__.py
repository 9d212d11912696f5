"""Pallas TPU kernels — the rebuild's native-code tier (SURVEY.md §2.3)."""
