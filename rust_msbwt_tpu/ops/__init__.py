"""Device-level ops: alphabet tables, RLE codec, rank kernels, BCR build, H-M merge."""
