"""Placeholder — populated in M2/M3."""
