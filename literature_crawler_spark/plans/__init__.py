"""Driver-side plans: snapshot state store, wave-loop crawl scheduler."""
