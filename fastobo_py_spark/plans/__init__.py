"""End-to-end job plans: the KG pipeline with resumable checkpoints."""
