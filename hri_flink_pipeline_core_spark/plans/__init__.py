"""Declarative pipeline plans."""
