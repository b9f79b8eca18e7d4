"""Sources: synthetic corpus generation, RIS bibliographic parsing, table loaders."""
