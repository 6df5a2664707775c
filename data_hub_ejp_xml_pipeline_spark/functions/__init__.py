"""Scalar / per-record transform functions (SURVEY.md §2.2 P1-P19)."""
