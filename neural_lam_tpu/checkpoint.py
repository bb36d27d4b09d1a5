"""Checkpointing: best-val + latest-rescue, self-describing.

Replaces Lightning's ``.ckpt`` files (reference: SURVEY.md 5.4) with
orbax checkpoints of ``{params, opt_state, step}`` plus a JSON sidecar
of the constructor arguments, so a checkpoint alone is enough to rebuild
the architecture (the reference stores the argparse namespace in
``hyper_parameters.args``, reference: neural_lam/train_model.py:41-72).
Graph buffers and normalization stats stay OUT of checkpoints and are
reloaded from the datastore/graph dir, matching the reference's
``persistent=False`` buffers
(reference: models/step_predictors/graph/base.py:114-119).

The dual-checkpoint policy mirrors the reference's two callbacks
(reference: train_model.py:500-516): ``best`` tracks min val loss,
``latest`` is written every epoch as a crash rescue.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree: Any) -> Any:
    """Fetch a pytree to host numpy, gathering leaves whose shards span
    other processes (e.g. ZeRO-1 data-axis-sharded optimizer moments),
    which plain ``device_get`` cannot fetch multi-host."""

    def get(x):
        if (
            isinstance(x, jax.Array)
            and not x.is_fully_addressable
        ):
            from jax.experimental import multihost_utils

            return np.asarray(
                multihost_utils.process_allgather(x, tiled=True)
            )
        return np.asarray(jax.device_get(x))

    return jax.tree_util.tree_map(get, tree)


def _flat_keys(tree: Any) -> set[str]:
    """Keystr set of a pytree without materialising its leaves."""
    return {
        jax.tree_util.keystr(path)
        for path, _ in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


class CheckpointManager:
    """Save/restore train state under ``run_dir/checkpoints``."""

    def __init__(self, run_dir: str | Path) -> None:
        self.ckpt_dir = Path(run_dir) / "checkpoints"
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()
        # Resuming into an existing run dir must not clobber a better
        # historical min_val_loss checkpoint (Lightning restores
        # best_model_score across resume; we persist it in best.json).
        self.best_val_loss = float("inf")
        best_path = self.ckpt_dir / "best.json"
        if best_path.exists():
            try:
                self.best_val_loss = float(
                    json.loads(best_path.read_text(encoding="utf-8"))[
                        "val_loss"
                    ]
                )
            except (ValueError, KeyError, TypeError,
                    json.JSONDecodeError):
                pass

    def _path(self, name: str) -> Path:
        return self.ckpt_dir / name

    def save(
        self,
        name: str,
        params: Any,
        opt_state: Any,
        step: int,
        hparams: Optional[dict] = None,
    ) -> None:
        """Write one named checkpoint (overwrites).

        Multi-host: every process calls into orbax, which coordinates
        internally (primary-host writes + its own barriers); only the
        hparams sidecar is rank-0-gated, followed by a barrier so no
        process can restore a half-written checkpoint.
        """
        path = self._path(name)
        state = {
            "params": _to_host(params),
            "opt_state": _to_host(opt_state),
            "step": np.int64(step),
        }
        self._ckptr.save(path.resolve(), state, force=True)
        if hparams is not None and jax.process_index() == 0:
            (path / "hparams.json").write_text(
                json.dumps(hparams, indent=2, default=str),
                encoding="utf-8",
            )
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"ckpt_save_{name}")

    def save_latest(self, params, opt_state, step, hparams=None) -> None:
        self.save("latest", params, opt_state, step, hparams)

    def maybe_save_best(
        self, val_loss: float, params, opt_state, step, hparams=None
    ) -> bool:
        """Save as ``min_val_loss`` iff this is the best validation loss."""
        if val_loss < self.best_val_loss:
            self.best_val_loss = val_loss
            self.save("min_val_loss", params, opt_state, step, hparams)
            if jax.process_index() == 0:
                (self.ckpt_dir / "best.json").write_text(
                    json.dumps({"val_loss": val_loss, "step": step}),
                    encoding="utf-8",
                )
            return True
        return False

    def restore(
        self, name: str, params_template: Any, opt_state_template: Any
    ) -> tuple[Any, Any, int]:
        """Restore ``(params, opt_state, step)`` against templates.

        Templates supply the pytree structure (orbax restores by
        structure); pass freshly initialised state.
        """
        path = self._path(name)
        if not path.exists():
            raise FileNotFoundError(f"No checkpoint at {path}")
        template = {
            "params": _to_host(params_template),
            "opt_state": _to_host(opt_state_template),
            "step": np.int64(0),
        }
        state = self._ckptr.restore(path.resolve(), item=template)
        return state["params"], state["opt_state"], int(state["step"])

    def restore_params_only(self, name: str, params_template: Any) -> Any:
        """Restore only model params (fresh optimizer — the reference's
        default unless ``--restore_opt``, reference: module.py:1012-1014).

        Reads only the params subtree from disk: the opt_state (2x the
        params in adamw moments) is never deserialised.
        """
        path = self._path(name)
        if not path.exists():
            raise FileNotFoundError(f"No checkpoint at {path}")
        host_template = _to_host(params_template)
        # Validate key sets against on-disk metadata (cheap, no array IO)
        # before the partial restore, for a readable error on mismatch.
        on_disk = self._ckptr.metadata(path.resolve()).item_metadata.tree
        template_keys = _flat_keys(host_template)
        disk_keys = _flat_keys(on_disk.get("params", {}))
        if template_keys != disk_keys:
            missing = template_keys - disk_keys
            extra = disk_keys - template_keys
            raise ValueError(
                f"Checkpoint params mismatch: missing {sorted(missing)}, "
                f"unexpected {sorted(extra)}"
            )
        item = {"params": host_template}
        state = self._ckptr.restore(
            path.resolve(),
            item=item,
            transforms={},
            restore_args=jax.tree_util.tree_map(
                lambda _: ocp.RestoreArgs(), item
            ),
        )
        return state["params"]

    def load_hparams(self, name: str) -> Optional[dict]:
        path = self._path(name) / "hparams.json"
        if not path.exists():
            return None
        return json.loads(path.read_text(encoding="utf-8"))


_ARCH_KEYS = (
    "graph",
    "hidden_dim",
    "hidden_layers",
    "processor_layers",
    "mesh_aggr",
    "num_past_forcing_steps",
    "num_future_forcing_steps",
    "output_std",
    "g2m_gnn_type",
    "m2g_gnn_type",
    "mesh_up_gnn_type",
    "mesh_down_gnn_type",
    # from the YAML config (train_model records them into hparams):
    # omitting them would rebuild an UNCLAMPED model from a clamped
    # checkpoint (reference applies clamping in every forward,
    # step_predictors/base.py:168-383)
    "output_clamping_lower",
    "output_clamping_upper",
)


def build_forecaster_from_hparams(hparams: dict, datastore):
    """Reconstruct the exact forecaster architecture from saved hparams.

    Checkpoints are self-describing: the CLI namespace is stored in
    ``hparams.json``, so the architecture can be rebuilt from the
    checkpoint alone with only the datastore re-injected — the same
    contract as the reference
    (reference: neural_lam/train_model.py:41-72,
    models/module.py:119-124).
    """
    from .models import MODELS, ARForecaster

    model_name = hparams["model"]
    kwargs = {}
    for key in _ARCH_KEYS:
        if key in hparams:
            kwargs["graph_name" if key == "graph" else key] = hparams[key]
    if model_name == "graph_lam":
        kwargs.pop("mesh_up_gnn_type", None)
        kwargs.pop("mesh_down_gnn_type", None)
    predictor = MODELS[model_name](datastore, **kwargs)
    return ARForecaster(predictor, datastore)


def load_forecaster_from_checkpoint(
    run_dir: str | Path, datastore, name: str = "latest"
):
    """Rebuild forecaster + params from a run directory alone.

    Returns ``(forecaster, params, hparams)``.
    """
    import jax

    mgr = CheckpointManager(run_dir)
    hparams = mgr.load_hparams(name)
    if hparams is None:
        raise FileNotFoundError(
            f"No hparams.json in checkpoint {name!r} under {run_dir}; "
            "cannot reconstruct the architecture"
        )
    forecaster = build_forecaster_from_hparams(hparams, datastore)
    template = forecaster.init_params(jax.random.PRNGKey(0))
    params = mgr.restore_params_only(name, template)
    return forecaster, params, hparams
