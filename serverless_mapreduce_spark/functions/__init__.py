"""Reusable column functions (vector math, …) shared by operator modules."""
