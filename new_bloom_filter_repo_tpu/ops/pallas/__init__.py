"""Pallas TPU kernels for the blocked rational-Bloom codec hot loops."""
