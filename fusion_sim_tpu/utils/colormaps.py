"""Colormaps, ranges, and LUT machinery for visualization.

TPU-native port of the reference plotting toolkit's color pipeline:

* ``Range`` — min/max -> [0,1] affine normalization with clamping
  (``makeRange``, utilities.js:1012-1064).
* ``ColorMap`` — piecewise-linear per-channel maps compiled into n-entry
  uint8 LUTs (``makeColorMap``, utilities.js:1079-1198).  The channel spec is
  a list of segments ``(x0, x1, y0, y1)``: for x in [x0, x1] the channel is
  the linear blend y0->y1 (later segments overwrite earlier ones, matching
  the reference's loop order).
* ``PRESETS`` — the 25 preset channel tables of utilities.js:1203-1317
  (jet, hot, doppler, ...), reproduced as data.

Unlike the reference (scalar JS loops), LUT construction and application are
vectorized; ``apply`` maps whole field arrays to RGB on device.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

Segment = tuple[float, float, float, float]


@dataclasses.dataclass
class Range:
    """Affine normalization of [min, max] onto [0, 1], clamped."""

    min: float
    max: float

    def norm(self, x):
        slope = 1.0 / (self.max - self.min)
        return np.clip(slope * x - slope * self.min, 0.0, 1.0)

    def norm_device(self, x):
        slope = 1.0 / (self.max - self.min)
        return jnp.clip(slope * x - slope * self.min, 0.0, 1.0)


def _build_channel(segments: list[Segment], n: int) -> np.ndarray:
    """Compile one channel's piecewise-linear segments into an n-entry LUT.

    Matches utilities.js:1106-1143: x = i/(n-1); for every segment containing
    x, the LUT entry is floor(255 * lerp) — later segments win.
    """
    lut = np.zeros(n, dtype=np.uint8)
    x = np.arange(n) / (n - 1)
    for x0, x1, y0, y1 in segments:
        mask = (x >= x0) & (x <= x1)
        s = (x[mask] - x0) / (x1 - x0)
        y = (1 - s) * y0 + s * y1
        lut[mask] = np.floor(255 * y).astype(np.uint8)
    return lut


class ColorMap(Range):
    """A compiled colormap: Range + (n, 3) uint8 LUT."""

    def __init__(self, min: float, max: float, n: int, params: dict):
        super().__init__(min=min, max=max)
        self.n = n
        self.lut = np.stack(
            [_build_channel(params.get(ch, []), n) for ch in ("r", "g", "b")], axis=-1
        )  # (n, 3) uint8
        self._lut_device = jnp.asarray(self.lut)

    def rgb(self, x) -> np.ndarray:
        """Scalar(s) -> uint8 RGB via the LUT (host)."""
        idx = np.floor((self.n - 1) * self.norm(x)).astype(np.int64)
        return self.lut[idx]

    def apply(self, field) -> jnp.ndarray:
        """Device-side: map a scalar field array to (..., 3) uint8 RGB."""
        idx = jnp.floor((self.n - 1) * self.norm_device(field)).astype(jnp.int32)
        return self._lut_device[idx]


# The 25 channel tables of utilities.js:1203-1317, verbatim as data.
PRESETS: dict[str, dict[str, list[Segment]]] = {
    "jet": {
        "r": [(0.4, 0.6, 0, 1), (0.6, 0.9, 1, 1), (0.9, 1, 1, 0.5)],
        "g": [(0.1, 0.4, 0, 1), (0.4, 0.6, 1, 1), (0.6, 0.9, 1, 0)],
        "b": [(0, 0.1, 0.5, 1), (0.1, 0.4, 1, 1), (0.4, 0.6, 1, 0)],
    },
    "hot": {
        "r": [(0, 0.35, 0, 1), (0.35, 1, 1, 1)],
        "g": [(0.35, 0.65, 0, 1), (0.65, 1, 1, 1)],
        "b": [(0.65, 1, 0, 1)],
    },
    "rainbow": {
        "r": [(0, 0.2, 1, 1), (0.2, 0.4, 1, 0), (0.8, 1, 0, 1)],
        "g": [(0, 0.2, 0, 1), (0.2, 0.6, 1, 1), (0.6, 0.8, 1, 0)],
        "b": [(0.4, 0.6, 0, 1), (0.6, 1, 1, 1)],
    },
    "gray": {"r": [(0, 1, 0, 1)], "g": [(0, 1, 0, 1)], "b": [(0, 1, 0, 1)]},
    "bone": {
        "r": [(0, 1, 0, 1)],
        "g": [(0, 1, 0, 1)],
        "b": [(0, 0.5, 0, 0.65), (0.5, 1, 0.65, 1)],
    },
    "violet": {
        "r": [(0, 0.5, 0, 1), (0.5, 1, 1, 1)],
        "g": [(0.5, 1, 0, 1)],
        "b": [(0, 0.5, 0, 1), (0.5, 1, 1, 1)],
    },
    "yellow": {
        "r": [(0, 0.5, 0, 1), (0.5, 1, 1, 1)],
        "g": [(0, 0.5, 0, 1), (0.5, 1, 1, 1)],
        "b": [(0.5, 1, 0, 1)],
    },
    "cyan": {
        "r": [(0.5, 1, 0, 1)],
        "g": [(0, 0.5, 0, 1), (0.5, 1, 1, 1)],
        "b": [(0, 0.5, 0, 1), (0.5, 1, 1, 1)],
    },
    "red_violet": {
        "r": [(0, 0.33, 0, 1), (0.33, 1, 1, 1)],
        "g": [(0.66, 1, 0, 1)],
        "b": [(0.33, 0.66, 0, 1), (0.66, 1, 1, 1)],
    },
    "green_cyan": {
        "r": [(0.66, 1, 0, 1)],
        "g": [(0, 0.33, 0, 1), (0.33, 1, 1, 1)],
        "b": [(0.33, 0.66, 0, 1), (0.66, 1, 1, 1)],
    },
    "green": {
        "r": [(0.5, 1, 0, 1)],
        "g": [(0, 0.5, 0, 1), (0.5, 1, 1, 1)],
        "b": [(0.5, 1, 0, 1)],
    },
    "red": {
        "r": [(0, 0.5, 0, 1), (0.5, 1, 1, 1)],
        "g": [(0.5, 1, 0, 1)],
        "b": [(0.5, 1, 0, 1)],
    },
    "blue": {
        "r": [(0.5, 1, 0, 1)],
        "g": [(0.5, 1, 0, 1)],
        "b": [(0, 0.5, 0, 1), (0.5, 1, 1, 1)],
    },
    "blue_cyan": {
        "r": [(0.66, 1, 0, 1)],
        "g": [(0.33, 0.66, 0, 1), (0.66, 1, 1, 1)],
        "b": [(0, 0.33, 0, 1), (0.33, 1, 1, 1)],
    },
    "mud": {"r": [(0, 1, 0, 1)], "g": [(0.33, 1, 0, 1)], "b": [(0.66, 1, 0, 1)]},
    "grass": {"r": [(0.33, 1, 0, 1)], "g": [(0, 1, 0, 1)], "b": [(0.66, 1, 0, 1)]},
    "purplehaze": {"r": [(0.33, 1, 0, 1)], "g": [(0.66, 1, 0, 1)], "b": [(0, 1, 0, 1)]},
    "atmosphere": {"r": [(0.66, 1, 0, 1)], "g": [(0.33, 1, 0, 1)], "b": [(0, 1, 0, 1)]},
    "pond": {"r": [(0.66, 1, 0, 1)], "g": [(0, 1, 0, 1)], "b": [(0.33, 1, 0, 1)]},
    "berry": {"r": [(0, 1, 0, 1)], "g": [(0.66, 1, 0, 1)], "b": [(0.33, 1, 0, 1)]},
    "doppler": {
        "r": [(0, 0.5, 1, 1), (0.5, 0.75, 1, 0)],
        "g": [(0, 0.5, 0, 1), (0.5, 1, 1, 0)],
        "b": [(0.25, 0.5, 0, 1), (0.5, 1, 1, 1)],
    },
    "autumn": {"r": [(0, 1, 1, 1)], "g": [(0, 1, 0, 1)], "b": []},
    "spring": {"r": [(0, 1, 1, 1)], "g": [(0, 1, 0, 1)], "b": [(0, 1, 1, 0)]},
    "winter": {"r": [(0, 1, 0, 0.3)], "g": [(0, 1, 0, 1)], "b": [(0, 1, 1, 0.3)]},
    "anime": {
        "r": [(0, 0.33, 0.7, 0.9), (0.33, 0.66, 0.9, 0), (0.95, 1, 0, 1)],
        "g": [(0, 0.33, 0.1, 0.7), (0.33, 0.66, 0.7, 0), (0.66, 1, 0, 1)],
        "b": [(0, 0.33, 0.15, 0.3), (0.33, 0.66, 0.3, 0.7), (0.66, 1, 0.7, 1)],
    },
}


def preset(name: str, min: float = 0.0, max: float = 1.0, n: int = 256) -> ColorMap:
    """Build a ColorMap from a named preset (default 256-entry LUT)."""
    if name not in PRESETS:
        raise KeyError(f"unknown colormap preset {name!r}; have {sorted(PRESETS)}")
    return ColorMap(min=min, max=max, n=n, params=PRESETS[name])
