"""Command-line entry points mirroring the reference surface:
track / track_demo / train / test / detect."""
