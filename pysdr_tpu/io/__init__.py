"""Host-side sources and sinks: .dat record/replay, wav, synthetic IQ."""
