"""Operators: parse pipeline, DNS answer decoder, the eight reference
aggregates (SURVEY.md §2.5), and large-scale extension operators."""
