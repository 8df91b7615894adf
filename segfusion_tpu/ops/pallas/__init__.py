"""Pallas TPU kernels for ops where explicit VMEM staging beats XLA's
default lowering."""
