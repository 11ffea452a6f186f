"""Host runtime: streaming executive, ring buffers, watchdog, profiler,
control plane servers."""
