"""Kernel library: every GLSL program of the reference becomes a jitted pure
function or Pallas kernel here (SURVEY.md §2 inventory)."""
