"""Placeholder — filled in by subsequent commits."""
