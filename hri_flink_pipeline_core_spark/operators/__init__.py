"""Engine operators (SURVEY.md §2.16 declared surface)."""
