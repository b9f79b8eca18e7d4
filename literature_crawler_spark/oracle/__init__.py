"""Single-threaded reference-semantics oracles for parity testing."""
