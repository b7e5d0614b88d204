"""DataFrame operators — the engine's physical building blocks."""
