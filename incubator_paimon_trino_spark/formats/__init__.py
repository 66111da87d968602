"""File-format fallbacks for environments missing optional Spark modules."""
