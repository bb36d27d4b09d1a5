"""Import machinery to run the reference's own torch modules in-process.

The golden-parity tests (test_reference_golden.py) compare this
framework against the *actual reference implementation* executing at
/root/reference — not against a re-derived oracle — so a misreading of
the reference semantics cannot hide in both sides of the comparison.

The reference's heavy dependencies (torch_geometric, pytorch_lightning,
loguru, tueplots, mlflow, wandb) are not installed in this image. They
are stubbed minimally:

- ``torch_geometric.nn.MessagePassing`` is re-implemented here to PyG
  2.3.1's documented contract (``propagate`` -> ``message`` ->
  ``aggregate`` -> ``update``, ``node_dim=-2``, scatter sum/mean with
  count-clamped mean). The reference's overrides — which ARE the
  behaviour under test — run verbatim on top of it.
- The logging/plotting libraries are inert attribute bags; only the
  modules under test (gnn_layers, utils.make_mlp and the numerics
  helpers, metrics) exercise real code paths.

The reference package's ``__init__`` (which imports the full model zoo)
is bypassed by installing a namespace-only parent package whose
``__path__`` points at the reference tree.
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

import torch
from torch import nn

REFERENCE_ROOT = Path("/root/reference")


class MessagePassingShim(nn.Module):
    """PyG-2.3.1-contract MessagePassing over dim -2.

    Supports exactly the surface the reference layers use:
    ``__init__(aggr=...)``, ``propagate(edge_index, x=, edge_attr=)``
    dispatching to ``message(x_j, x_i, edge_attr)`` ->
    ``aggregate(inputs, index, ptr, dim_size)`` -> ``update(inputs)``,
    and a base ``aggregate`` doing scatter sum / count-clamped mean.
    """

    def __init__(self, aggr: str = "add", node_dim: int = -2) -> None:
        super().__init__()
        if aggr == "sum":
            aggr = "add"
        assert aggr in ("add", "mean"), aggr
        self.aggr = aggr
        self.node_dim = node_dim

    def propagate(self, edge_index, x, edge_attr):
        send_idx, recv_idx = edge_index[0], edge_index[1]
        x_j = x.index_select(self.node_dim, send_idx)
        x_i = x.index_select(self.node_dim, recv_idx)
        msg = self.message(x_j=x_j, x_i=x_i, edge_attr=edge_attr)
        out = self.aggregate(
            msg, recv_idx, None, x.shape[self.node_dim]
        )
        return self.update(out)

    def aggregate(self, inputs, index, ptr, dim_size):
        shape = list(inputs.shape)
        shape[self.node_dim] = dim_size
        out = torch.zeros(shape, dtype=inputs.dtype, device=inputs.device)
        idx = index.view(
            (1,) * (inputs.dim() + self.node_dim) + (-1, 1)
        ).expand_as(inputs)
        out.scatter_add_(self.node_dim, idx, inputs)
        if self.aggr == "mean":
            counts = torch.zeros(
                dim_size, dtype=inputs.dtype, device=inputs.device
            )
            counts.scatter_add_(
                0, index, torch.ones_like(index, dtype=inputs.dtype)
            )
            counts = counts.clamp(min=1).view(
                (1,) * (inputs.dim() + self.node_dim) + (-1, 1)
            )
            out = out / counts
        return out

    def update(self, inputs):
        return inputs

    def message(self, x_j, x_i, edge_attr):  # pragma: no cover
        raise NotImplementedError


def _bag(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _install_stubs() -> None:
    if "torch_geometric" in sys.modules:
        return

    pyg = _bag("torch_geometric")
    pyg_nn = _bag("torch_geometric.nn", MessagePassing=MessagePassingShim)
    pyg.nn = pyg_nn

    class _AnyLogger:
        def __init__(self, *a, **k):
            pass

        def __getattr__(self, _):
            return lambda *a, **k: None

    def _rank_zero_only(fn):
        return fn

    _rank_zero_only.rank = 0

    pl = _bag("pytorch_lightning", LightningModule=nn.Module)
    pl.loggers = _bag(
        "pytorch_lightning.loggers",
        MLFlowLogger=_AnyLogger,
        WandbLogger=_AnyLogger,
    )
    pl.utilities = _bag(
        "pytorch_lightning.utilities", rank_zero_only=_rank_zero_only
    )

    class _Loguru:
        def __getattr__(self, _):
            return lambda *a, **k: None

        def catch(self, fn=None, **k):
            return fn if fn is not None else (lambda f: f)

    _bag("loguru", logger=_Loguru())
    _bag("tueplots", bundles=types.SimpleNamespace(), figsizes=types.SimpleNamespace())
    mlflow = _bag("mlflow", pytorch=types.SimpleNamespace())
    mlflow.start_run = lambda *a, **k: None
    _bag("mlflow.pytorch")
    _bag("wandb")


def _install_reference_package() -> None:
    if "neural_lam" in sys.modules:
        return
    pkg = types.ModuleType("neural_lam")
    pkg.__path__ = [str(REFERENCE_ROOT / "neural_lam")]
    pkg.__package__ = "neural_lam"
    sys.modules["neural_lam"] = pkg


def load_reference_module(name: str):
    """Import ``neural_lam.<name>`` from /root/reference with stubs."""
    _install_stubs()
    _install_reference_package()
    import importlib

    return importlib.import_module(f"neural_lam.{name}")


# -- weight transplants ------------------------------------------------------
def mlp_params_from_torch(seq: nn.Sequential) -> dict:
    """Torch ``make_mlp`` Sequential -> our MLPParams pytree."""
    layers = []
    ln = None
    for mod in seq:
        if isinstance(mod, nn.Linear):
            layers.append(
                {
                    "w": mod.weight.detach().numpy().T.copy(),
                    "b": mod.bias.detach().numpy().copy(),
                }
            )
        elif isinstance(mod, nn.LayerNorm):
            ln = {
                "scale": mod.weight.detach().numpy().copy(),
                "bias": mod.bias.detach().numpy().copy(),
            }
    return {"layers": layers, "ln": ln}


def gnn_params_from_torch(net) -> dict:
    """Reference InteractionNet/PropagationNet -> our
    InteractionNetParams (handles SplitMLPs chunking)."""

    def mlps_of(mod):
        if hasattr(mod, "mlps"):  # SplitMLPs
            return [mlp_params_from_torch(m) for m in mod.mlps]
        return [mlp_params_from_torch(mod)]

    return {"edge": mlps_of(net.edge_mlp), "aggr": mlps_of(net.aggr_mlp)}
