"""Convert reference (PyTorch Lightning) checkpoints to this framework.

Maps the reference's ``state_dict`` naming
(reference: neural_lam/utils.py:538-570 ``make_mlp`` Sequential layout;
neural_lam/gnn_layers.py:90-107 ``edge_mlp``/``aggr_mlp``;
models/module.py:964-1010 ``forecaster.predictor.*`` prefixes) onto the
parameter pytrees produced by ``model.init_params``. With a converted
checkpoint, a model trained with the reference runs here unchanged —
the transplanted-weight parity path (SURVEY.md §7 phase 2/4).

Linear weights transpose from torch's ``(out, in)`` to ``(in, out)``;
LayerNorm ``weight``/``bias`` become ``scale``/``bias``.

CLI::

    python -m neural_lam_tpu.convert_checkpoint \
        --ckpt path/to/min_val_loss.ckpt --config_path config.yaml \
        --model graph_lam --graph multiscale --out runs/converted
"""

from __future__ import annotations

import argparse
from typing import Any, Callable

import numpy as np


def _mlp_entries(prefix: str, mlp_params: dict):
    """Yield (our_path_leaf_setter, torch_key, transform) for one MLP."""
    n = len(mlp_params["layers"])
    for i in range(n):
        yield (("layers", i, "w"), f"{prefix}.{2 * i}.weight", True)
        yield (("layers", i, "b"), f"{prefix}.{2 * i}.bias", False)
    if mlp_params["ln"] is not None:
        ln_idx = 2 * n - 1
        yield (("ln", "scale"), f"{prefix}.{ln_idx}.weight", False)
        yield (("ln", "bias"), f"{prefix}.{ln_idx}.bias", False)


def _gnn_entries(prefix: str, gnn_params: dict):
    for role, torch_name in (("edge", "edge_mlp"), ("aggr", "aggr_mlp")):
        mlps = gnn_params[role]
        if len(mlps) == 1:
            for path, key, t in _mlp_entries(
                f"{prefix}.{torch_name}", mlps[0]
            ):
                yield ((role, 0) + path, key, t)
        else:
            # SplitMLPs: chunk MLPs under ``.mlps.<k>``
            # (reference: gnn_layers.py:96-107, 303).
            for k, mlp in enumerate(mlps):
                for path, key, t in _mlp_entries(
                    f"{prefix}.{torch_name}.mlps.{k}", mlp
                ):
                    yield ((role, k) + path, key, t)


def _entries_for_params(params: dict, processor_name_fn: Callable):
    """Yield (our_path, torch_key, transpose) for a full param tree."""
    for name, sub in params.items():
        if isinstance(sub, dict) and "layers" in sub:  # plain MLP
            yield from (
                ((name,) + p, k, t)
                for p, k, t in _mlp_entries(name, sub)
            )
        elif isinstance(sub, dict) and "edge" in sub:  # GNN
            yield from (
                ((name,) + p, k, t)
                for p, k, t in _gnn_entries(name, sub)
            )
        elif isinstance(sub, list) and name == "processor":
            for i, net in enumerate(sub):
                prefix = processor_name_fn(i)
                yield from (
                    ((name, i) + p, k, t)
                    for p, k, t in _gnn_entries(prefix, net)
                )
        elif isinstance(sub, list) and sub and isinstance(sub[0], dict):
            # flat ModuleList of MLPs or GNNs (hierarchical embedders /
            # init/read GNNs)
            for i, item in enumerate(sub):
                if "layers" in item:
                    yield from (
                        ((name, i) + p, k, t)
                        for p, k, t in _mlp_entries(f"{name}.{i}", item)
                    )
                else:
                    yield from (
                        ((name, i) + p, k, t)
                        for p, k, t in _gnn_entries(f"{name}.{i}", item)
                    )
        elif isinstance(sub, list) and sub and isinstance(sub[0], list):
            # nested (processor_layers x levels) GNN stacks (HiLAM)
            for i, row in enumerate(sub):
                for j, item in enumerate(row):
                    yield from (
                        ((name, i, j) + p, k, t)
                        for p, k, t in _gnn_entries(
                            f"{name}.{i}.{j}", item
                        )
                    )
        else:
            raise ValueError(f"Unrecognised param subtree {name!r}")


def _set_path(tree: Any, path: tuple, value) -> None:
    node = tree
    for key in path[:-1]:
        node = node[key]
    node[path[-1]] = value


def convert_state_dict(
    state_dict: dict, params_template: dict, strict: bool = True
) -> dict:
    """Convert a reference ``state_dict`` into our parameter pytree.

    ``params_template`` supplies the structure (from
    ``model.init_params``); shapes are validated leaf by leaf.
    """
    import copy

    import jax.numpy as jnp

    # Strip Lightning prefixes and apply the legacy-ARModel rename
    # (reference: module.py:974-1010: flat pre-refactor checkpoints and
    # the ``g2m_gnn.grid_mlp`` -> ``encoding_grid_mlp`` move).
    cleaned = {}
    for key, tensor in state_dict.items():
        for prefix in ("forecaster.predictor.", "predictor.", "model."):
            if key.startswith(prefix):
                key = key[len(prefix):]
                break
        if key.startswith("g2m_gnn.grid_mlp."):
            key = "encoding_grid_mlp." + key[len("g2m_gnn.grid_mlp."):]
        cleaned[key] = np.asarray(
            tensor.detach().cpu().numpy()
            if hasattr(tensor, "detach")
            else tensor
        )

    def processor_name_fn(i: int) -> str:
        # pyg.nn.Sequential child naming ("module_{i}"); plain indices
        # accepted as fallback.
        for cand in (f"processor.module_{i}", f"processor.{i}"):
            prefix = cand + "."
            if any(k.startswith(prefix) for k in cleaned):
                return cand
        return f"processor.module_{i}"

    out = copy.deepcopy(params_template)
    missing, converted = [], 0
    for path, torch_key, transpose in _entries_for_params(
        out, processor_name_fn
    ):
        if torch_key not in cleaned:
            missing.append(torch_key)
            continue
        arr = cleaned[torch_key]
        if transpose:
            arr = arr.T
        node = out
        for key in path[:-1]:
            node = node[key]
        expected = np.asarray(node[path[-1]]).shape
        if tuple(arr.shape) != tuple(expected):
            raise ValueError(
                f"Shape mismatch for {torch_key}: checkpoint "
                f"{arr.shape} vs model {expected}"
            )
        _set_path(out, path, jnp.asarray(arr.astype(np.float32)))
        converted += 1
    if missing and strict:
        raise KeyError(
            f"Missing {len(missing)} keys in checkpoint, e.g. "
            f"{missing[:5]}"
        )
    return out


def export_state_dict(params: dict) -> dict:
    """Inverse mapping: our param pytree -> reference-style state_dict
    (numpy arrays). Useful for round-trip tests and for moving weights
    back to the reference."""
    out = {}

    def processor_name_fn(i: int) -> str:
        return f"processor.module_{i}"

    for path, torch_key, transpose in _entries_for_params(
        params, processor_name_fn
    ):
        node = params
        for key in path:
            node = node[key]
        arr = np.asarray(node)
        out[torch_key] = arr.T if transpose else arr
    return out


def main(argv=None) -> None:
    from .checkpoint import CheckpointManager, build_forecaster_from_hparams
    from .config import load_config_and_datastore

    parser = argparse.ArgumentParser(
        description="Convert a reference Lightning checkpoint"
    )
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--model", type=str, default="graph_lam")
    parser.add_argument("--graph", type=str, default="multiscale")
    parser.add_argument("--hidden_dim", type=int, default=64)
    parser.add_argument("--hidden_layers", type=int, default=1)
    parser.add_argument("--processor_layers", type=int, default=4)
    # Optimizer config for the opt-state template: must match the
    # trainer that will restore this checkpoint (the template's pytree
    # shape depends on it, e.g. under --flat_opt).
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--weight_decay", type=float, default=0.01)
    parser.add_argument("--flat_opt", action="store_true")
    parser.add_argument("--out", type=str, required=True)
    args = parser.parse_args(argv)

    import torch

    ckpt = torch.load(
        args.ckpt, map_location="cpu", weights_only=False
    )
    state_dict = ckpt.get("state_dict", ckpt)

    _, datastore = load_config_and_datastore(args.config_path)
    hparams = vars(args) | {"mesh_aggr": "sum", "output_std": False}
    forecaster = build_forecaster_from_hparams(hparams, datastore)

    import jax

    template = forecaster.init_params(jax.random.PRNGKey(0))
    params = convert_state_dict(state_dict, template)

    from .trainer import make_optimizer

    # Build the template through the trainer's own optimizer factory so
    # the opt-state pytree shape always matches what Trainer will
    # restore into (reference optimizer: models/module.py:284-287).
    opt_state = make_optimizer(
        args.lr, weight_decay=args.weight_decay, flat_opt=args.flat_opt
    ).init(params)
    mgr = CheckpointManager(args.out)
    mgr.save_latest(params, opt_state, step=0, hparams=hparams)
    print(f"Converted checkpoint written to {args.out}/checkpoints/latest")


if __name__ == "__main__":
    main()
