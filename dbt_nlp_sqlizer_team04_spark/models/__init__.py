"""Trained schema models: embedding encoder, trainer, persistence,
progress, and semantic inference (A12/A13/A19-A22 of SURVEY.md §2.A)."""
