"""Query operators — one module per reference algorithm family (SURVEY §2)."""
