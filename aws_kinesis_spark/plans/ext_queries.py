"""[EXT] LLM-data-pipeline queries (SURVEY.md §2.G) — filled in M4."""
