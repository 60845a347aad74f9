"""Shared utilities: timing, config plumbing, logging."""
