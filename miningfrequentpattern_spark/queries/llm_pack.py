"""Placeholder — filled in by later build phase."""
