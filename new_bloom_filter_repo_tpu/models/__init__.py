"""Codec model families: bloom filters, binary codec, frame codec, video."""
