"""DataFrame-level operators: the engine's logical-plan building blocks."""
