"""Cross-run state: checkpoint manifest + lineage (SURVEY.md §2.1 S5)."""
