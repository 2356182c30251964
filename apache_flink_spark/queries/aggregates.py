"""Stub — populated in a later milestone."""
