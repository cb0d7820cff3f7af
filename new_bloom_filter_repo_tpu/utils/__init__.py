"""Host-side utilities: container I/O, YUV frames, video I/O, stats."""
