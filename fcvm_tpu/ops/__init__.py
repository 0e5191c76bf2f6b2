"""Batched TPU compute kernels: elements, assembly, solver, material."""
