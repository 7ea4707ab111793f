"""On-device scalar diagnostics (SURVEY.md §5 metrics/observability).

The reference's only observables are the rendered density/|B| canvas and an
FPS counter (fusionsim.js:180-199); the framework upgrade is a set of
on-device reductions computed every N steps without host round-trips:
kinetic energy, energy drift, momentum, particle-loss/respawn rate, and
grid-charge totals.  All functions are jit-safe pure reductions returning
scalars; ``DiagnosticsRecorder`` accumulates a host-side time series.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp

from ..constants import SPEED_OF_LIGHT


@jax.jit
def pusher_diagnostics(position: jax.Array, velocity: jax.Array,
                       alive: jax.Array,
                       valid: jax.Array | None = None) -> dict[str, jax.Array]:
    """Scalar diagnostics for the cylindrical pusher state.

    Velocities are the stored normalized values (units of c with per-axis
    scale factors); kinetic energy here is the *normalized* sum |v|^2 used
    for drift tracking (the BASELINE energy-drift metric compares relative
    drift, which scale factors cancel out of when fields are static).

    ``valid`` (optional, (N,) bool): mask for padded layouts — filler rows
    are excluded from every reduction (the tile-sorted fast path passes
    its validity mask).
    """
    if valid is None:
        vf = jnp.ones(position.shape[0], jnp.float32)
    else:
        vf = valid.astype(jnp.float32)
    nv = jnp.maximum(jnp.sum(vf), 1.0)
    v2 = jnp.sum(velocity * velocity, axis=-1) * vf
    r = jnp.sqrt(position[..., 0] ** 2 + position[..., 1] ** 2)
    return {
        "kinetic": 0.5 * jnp.sum(v2),
        "v_max": jnp.sqrt(jnp.max(v2)),
        "momentum_x": jnp.sum(velocity[..., 0] * vf),
        "momentum_y": jnp.sum(velocity[..., 1] * vf),
        "momentum_z": jnp.sum(velocity[..., 2] * vf),
        "respawn_fraction": jnp.sum((1.0 - alive) * vf) / nv,
        "r_mean": jnp.sum(r * vf) / nv,
        "z_mean": jnp.sum(position[..., 2] * vf) / nv,
    }


def energy_drift(kinetic_series) -> float:
    """Relative energy drift |E_n - E_0| / E_0 over a recorded series —
    the BASELINE.json target is < 1e-3 over 10k steps."""
    import numpy as np

    ks = np.asarray(kinetic_series, dtype=np.float64)
    if len(ks) < 2 or ks[0] == 0:
        return 0.0
    return float(np.abs(ks - ks[0]).max() / np.abs(ks[0]))


@dataclasses.dataclass
class DiagnosticsRecorder:
    """Host-side ring of diagnostic samples with steps/sec accounting.

    The TPU equivalent of the reference's 1-second FPS window
    (fusionsim.js:180-199): ``tick(n_steps)`` after each batch; ``rate()``
    returns steps/sec and pushes/sec over the window.
    """

    n_particles: int
    window_seconds: float = 1.0

    def __post_init__(self):
        self.samples: list[dict] = []
        self._win_start = time.perf_counter()
        self._win_steps = 0
        self._last_rate = {"steps_per_sec": 0.0, "pushes_per_sec": 0.0}

    def record(self, step: int, values: dict) -> None:
        entry = {"step": step}
        entry.update({k: float(v) for k, v in values.items()})
        self.samples.append(entry)

    def tick(self, n_steps: int) -> dict:
        self._win_steps += n_steps
        now = time.perf_counter()
        elapsed = now - self._win_start
        if elapsed >= self.window_seconds:
            sps = self._win_steps / elapsed
            self._last_rate = {
                "steps_per_sec": sps,
                # two half-steps per step, like empic.js:1436-1469
                "pushes_per_sec": sps * 2 * self.n_particles,
            }
            self._win_start = now
            self._win_steps = 0
        return self._last_rate

    def series(self, key: str):
        return [s[key] for s in self.samples if key in s]
