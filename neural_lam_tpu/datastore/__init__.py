"""Datastores: pluggable access to state/forcing/static weather data.

Mirrors the reference datastore contract
(reference: neural_lam/datastore/__init__.py:13-49) with a registry and an
``init_datastore`` factory.
"""

from __future__ import annotations

from .base import (  # noqa: F401
    BaseDatastore,
    BaseRegularGridDatastore,
    CartesianGridShape,
)
from .dummy import DummyDatastore

DATASTORES: dict[str, type] = {
    "dummydata": DummyDatastore,
}


def register_datastore(kind: str, cls: type) -> None:
    DATASTORES[kind] = cls


def _register_optional() -> None:
    """Register datastores with heavier deps, tolerating missing backends."""
    from .npyfilesmeps import NpyFilesDatastoreMEPS

    DATASTORES["npyfilesmeps"] = NpyFilesDatastoreMEPS

    from .mdp import MDPDatastore

    DATASTORES["mdp"] = MDPDatastore


_register_optional()


def init_datastore(datastore_kind: str, config_path) -> BaseDatastore:
    """Instantiate the datastore of the given kind from its config file."""
    if datastore_kind not in DATASTORES:
        raise NotImplementedError(
            f"Datastore kind {datastore_kind!r} is not implemented "
            f"(available: {sorted(DATASTORES)})"
        )
    return DATASTORES[datastore_kind](config_path=config_path)
