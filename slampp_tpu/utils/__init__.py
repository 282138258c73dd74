"""Utilities: timers, memory usage, FLOP accounting (reference layer L0)."""
