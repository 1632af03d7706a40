"""Streaming shell: the census pipeline (parity mode), event-time windowed
variants (idiomatic mode), the micro-batch fixture generator, and the reset
utility."""
