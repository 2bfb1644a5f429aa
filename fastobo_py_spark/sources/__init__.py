"""Sources: deterministic corpus synthesis + table loaders."""
