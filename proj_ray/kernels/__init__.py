"""Vectorized NumPy numerical kernels shared by the operator set."""
