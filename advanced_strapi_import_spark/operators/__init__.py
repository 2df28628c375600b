"""Dataflow operators (SURVEY.md §2) — each module is a family of lazy
DataFrame transformations; no collect() in any hot path."""
