"""Plan-level utilities: summary-table fast path, explain helpers."""
