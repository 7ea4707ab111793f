"""fusion_sim_tpu — a TPU-native particle-in-cell plasma simulation framework.

A from-scratch JAX/XLA/Pallas/pjit re-creation of the capabilities of
kcdodd/fusion-sim (a 2015 WebGL browser PIC app; see SURVEY.md for the full
structural map).  The compute path is pure JAX over SoA arrays; parallelism
is jax.sharding over device meshes; the hot kernels are fused under jit with
Pallas where XLA fusion is insufficient.

Top-level layout:

* ``models``   — simulation model families (cylindrical test-particle pusher,
  electrostatic PIC, electromagnetic Yee PIC, spindle BEM).
* ``ops``      — the kernel library (Boris push, deposition, field sources,
  samplers, linear/spectral solvers, FDTD stencils).
* ``parallel`` — meshes, shardings, halo exchange, particle migration.
* ``utils``    — colormaps/rendering, diagnostics, checkpointing, profiling.
"""

from . import config, constants  # noqa: F401
from .models.pusher import (  # noqa: F401
    CylindricalParticlePusher,
    PusherSpec,
    make_cylindrical_particle_pusher,
)

__version__ = "0.1.0"
