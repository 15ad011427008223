"""Placeholder — filled in during round 1."""

QUERIES: dict = {}
ORACLES: dict = {}
