"""Reusable distributed operators (pure DataFrame compositions)."""
