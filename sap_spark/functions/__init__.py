"""Vectorized functions: decode kernels (EDM parity), text analysis,
similarity/dedup primitives."""
