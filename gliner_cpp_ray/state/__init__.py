"""Deliberately-centralized state: union-find, checkpoints, manifests."""
