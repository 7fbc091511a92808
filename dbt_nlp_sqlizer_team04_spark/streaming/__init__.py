"""Structured Streaming paths over the events table (SURVEY.md §2.D —
an engine extension; the reference has no streaming surface)."""
