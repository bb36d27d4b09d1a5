"""MEPS forecast .npy datastore — implemented in a later phase.

Will lazily memmap MEPS ``.npy`` forecast files
(reference: neural_lam/datastore/npyfilesmeps/store.py).
"""

from __future__ import annotations

from ..base import BaseRegularGridDatastore


class NpyFilesDatastoreMEPS(
    BaseRegularGridDatastore
):  # pragma: no cover - stub
    def __init__(self, config_path):
        raise NotImplementedError(
            "NpyFilesDatastoreMEPS is not implemented yet in this build phase"
        )
