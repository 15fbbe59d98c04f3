"""Data layer: audio IO (native FLAC), dataset, loaders, corpus builder."""
