"""Pallas TPU kernels for ops where XLA's default lowering leaves bandwidth
on the table (see PERF.md for the profiling that motivated each kernel)."""
