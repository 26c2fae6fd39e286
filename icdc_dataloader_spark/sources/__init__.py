"""Sources: model-driven TSV scan (the reference's input format) and the
deterministic synthetic CDC event generator used by tests and benches."""
