"""hebbax command-line entry points (one per reference script)."""
