"""Scalar / vectorized kernels shared by the stages (SURVEY.md §2.10)."""
