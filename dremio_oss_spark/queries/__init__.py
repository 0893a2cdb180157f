"""Query corpus: TPC-H-derived suite + operator-coverage queries."""
