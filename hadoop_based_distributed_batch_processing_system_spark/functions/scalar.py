"""Placeholder — operators land in M1+."""
