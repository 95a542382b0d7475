"""DataFrame-level operators (extraction, audit, consensus, dedup, ANN...)."""
