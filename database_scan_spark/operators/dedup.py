"""Placeholder — filled in a later milestone."""

SPECS: list = []
