"""Training-data pipeline functions: text analysis, dedup, ANN search."""
