"""Domain-split oracle modules; import via pipelines.queries."""
