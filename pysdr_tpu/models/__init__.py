"""Composed receivers: channel chain, multi-channel bank, RTTY decoder."""
