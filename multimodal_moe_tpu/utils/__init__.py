"""Cross-cutting utilities: profiling, timing, seeding."""
