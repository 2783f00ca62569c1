"""Host-side utilities: key streams, bucketing, IO, status display."""
