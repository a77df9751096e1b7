"""Placeholder — filled in by later build waves."""
