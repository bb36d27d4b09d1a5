"""Configuration dataclasses for the MEPS numpy-file datastore.

Schema matches the reference
(reference: neural_lam/datastore/npyfilesmeps/config.py:12-74) so
existing ``data_config.yaml`` files parse unchanged; the loader is
hand-rolled YAML instead of dataclass_wizard.
"""

from __future__ import annotations

import dataclasses
from datetime import timedelta
from pathlib import Path
from typing import Any

import yaml


@dataclasses.dataclass
class Projection:
    """Cartopy projection spec: class name + constructor kwargs."""

    class_name: str
    kwargs: dict[str, Any]


@dataclasses.dataclass
class Dataset:
    """Dataset metadata: variables, timesteps, ensemble size."""

    name: str
    var_names: list[str]
    var_units: list[str]
    var_longnames: list[str]
    num_forcing_features: int
    num_timesteps: int
    step_length: timedelta
    num_ensemble_members: int
    remove_state_features_with_index: list[int] = dataclasses.field(
        default_factory=list
    )


@dataclasses.dataclass
class NpyDatastoreConfig:
    """Top-level MEPS datastore configuration."""

    dataset: Dataset
    grid_shape_state: list[int]  # [ny, nx], matching the reference layout
    projection: Projection

    @classmethod
    def from_yaml_file(cls, path: str | Path) -> "NpyDatastoreConfig":
        with open(path, "r", encoding="utf-8") as f:
            data = yaml.safe_load(f)
        ds = dict(data["dataset"])
        step_length = ds["step_length"]
        if not isinstance(step_length, timedelta):
            # Plain numbers mean hours (the reference YAML convention);
            # ISO-8601 "PT3H" strings are also accepted.
            if isinstance(step_length, str) and step_length.upper().startswith(
                "PT"
            ):
                s = step_length.upper()
                hours = float(s[2:-1]) if s.endswith("H") else 0.0
                step_length = timedelta(hours=hours)
            else:
                step_length = timedelta(hours=float(step_length))
        ds["step_length"] = step_length
        return cls(
            dataset=Dataset(**ds),
            grid_shape_state=list(data["grid_shape_state"]),
            projection=Projection(**data["projection"]),
        )
