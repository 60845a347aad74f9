"""Appearance models: DeepSORT CNN, OSNet, AFLink, DHN — in Flax."""
