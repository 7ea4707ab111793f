"""Meshes, shardings, halo exchange, and particle migration."""
