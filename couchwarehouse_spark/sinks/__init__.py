"""External warehouse sinks (SURVEY.md §2.B S17-S19)."""
