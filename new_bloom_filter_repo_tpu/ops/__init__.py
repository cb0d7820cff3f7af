"""Device-side vector ops: 64-bit emulation, xxh64 lanes, bloom kernels."""
