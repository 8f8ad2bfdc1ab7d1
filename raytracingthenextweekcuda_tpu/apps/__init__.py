"""Application entry points: benchmark, inverse-rendering fit, progressive render."""
