"""Distributed operators (SURVEY.md §2.4 O1–O20): the engine proper."""
