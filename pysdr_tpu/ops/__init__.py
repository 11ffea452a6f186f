"""Pure-JAX + Pallas DSP operator library (CPU-testable, TPU-fast)."""
