"""Data layer: sequence loaders, letterbox preprocessing, result writers."""
