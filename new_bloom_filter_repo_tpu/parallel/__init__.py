"""Multi-chip execution: device meshes, frame (dp) and index-range (sp)
sharding with XLA collectives over ICI."""
