"""MDP (mllam-data-prep) zarr datastore — implemented in a later phase.

Will load zarr datasets produced by mllam-data-prep via a pure-python zarr
reader (reference: neural_lam/datastore/mdp.py).
"""

from __future__ import annotations

from .base import BaseRegularGridDatastore


class MDPDatastore(BaseRegularGridDatastore):  # pragma: no cover - stub
    def __init__(self, config_path):
        raise NotImplementedError(
            "MDPDatastore is not implemented yet in this build phase"
        )
