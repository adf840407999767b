"""Pallas TPU kernels for the hot limb paths."""
