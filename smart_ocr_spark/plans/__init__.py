"""End-to-end pipeline drivers (the socr 5-phase lifecycle on DataFrames)."""
