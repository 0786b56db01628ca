"""Plan/quality utilities: data-quality invariant checks and plan
inspection helpers."""
