"""Low-level batched block kernels (the framework's BLAS; Pallas/XLA)."""
