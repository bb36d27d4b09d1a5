"""Shared utilities: labeled arrays, numerics, seeding and logging."""

import random

import numpy as np

from .labeled import FieldArray  # noqa: F401
from .numerics import inverse_sigmoid, inverse_softplus  # noqa: F401


def seed_everything(seed: int) -> None:
    """Seed Python and numpy global RNGs.

    JAX randomness is already explicit (PRNGKey threading), so only the
    host-side RNGs need seeding — the counterpart of Lightning's
    ``seed_everything`` (reference: neural_lam/train_model.py:391).
    """
    random.seed(seed)
    np.random.seed(seed)
