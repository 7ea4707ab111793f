"""Checkpoint/resume (SURVEY.md §5: the symmetric state API the reference
lacks — its GPU state could be uploaded via out.set but never read back).

Two backends:

* ``save_npz``/``load_npz`` — dependency-free .npz of a flat
  ``{name: array}`` blob (the format of the models' ``get_state``).
* ``save_orbax``/``load_orbax`` — orbax-checkpoint for sharded,
  multi-host-safe PyTree checkpoints (used for the big sharded runs).
"""

from __future__ import annotations

import os

import numpy as np


def save_npz(path: str, blob: dict[str, np.ndarray]) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in blob.items()})


def load_npz(path: str) -> dict[str, np.ndarray]:
    with np.load(path) as data:
        return {k: data[k] for k in data.files}


def save_orbax(path: str, pytree) -> None:
    """Orbax PyTree checkpoint (preserves shardings on restore-by-template)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), pytree, force=True)
    ckptr.wait_until_finished()


def load_orbax(path: str, template):
    """Restore with ``template`` supplying structure/shardings."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
