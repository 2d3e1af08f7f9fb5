"""Distributed stages (SURVEY.md §2.2-§2.7): thin Ray Data wrappers over core/."""
