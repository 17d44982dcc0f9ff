"""Operator implementations (vectorized; one class per reference operator)."""
