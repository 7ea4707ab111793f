"""Simulation model families."""
