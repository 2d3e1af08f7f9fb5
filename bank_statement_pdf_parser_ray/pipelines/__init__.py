"""Pipeline compositions (SURVEY.md §3.2 entry point B)."""
