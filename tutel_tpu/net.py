"""Collectives facade placeholder."""
