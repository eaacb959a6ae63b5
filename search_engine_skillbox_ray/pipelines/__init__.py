"""Subpackage — see package docstring."""
