"""Shared utilities: labeled arrays, numerics and logging."""

from .labeled import FieldArray  # noqa: F401
from .numerics import inverse_sigmoid, inverse_softplus  # noqa: F401
