"""Scalar/aggregate building blocks shared by operators."""
