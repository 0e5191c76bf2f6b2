"""Runtime: nonlinear driver, buckling, checkpointing, reports, profiling."""
