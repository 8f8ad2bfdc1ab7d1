"""Cross-cutting utilities: timing, progress, logging, device info."""
