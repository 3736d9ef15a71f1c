"""Operators: graph read surface + large-scale pipeline extensions."""
