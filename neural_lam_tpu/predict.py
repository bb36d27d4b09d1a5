"""Forecast export CLI: load a trained checkpoint, write forecasts.

The serving surface the reference lacks — its ``--eval test`` path only
writes metrics and plots (reference: neural_lam/train_model.py:537-544,
models/module.py:770-962); there is no way to get the actual forecast
fields out. Here::

    python -m neural_lam_tpu.predict --config_path cfg.yaml \
        --load runs/myrun --split test --ar_steps 19 --out forecasts/

runs the autoregressive rollout over the split and writes one
``forecast_<split>_<index>.npz`` per sample with

- ``prediction``: ``(ar_steps, num_grid_points, d_state)`` float32 in
  PHYSICAL units (destandardized),
- ``pred_std``: same shape, physical units (models with an output-std
  head only),
- ``target_times``: ``(ar_steps,)`` int64 epoch-nanoseconds,

plus one ``forecast_meta.json`` with variable names/units and grid
shape. Boundary forcing uses the split's own analysis states, exactly
as in evaluation (LAM models are driven at the domain edge,
reference: models/forecasters/autoregressive.py:116-136).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument(
        "--load",
        type=str,
        required=True,
        help="Run dir, its checkpoints/ dir, or a specific checkpoint "
        "(.../checkpoints/{latest,min_val_loss})",
    )
    parser.add_argument("--split", type=str, default="test")
    parser.add_argument(
        "--ar_steps", type=int, default=19,
        help="Rollout length (the 19-step MEPS protocol by default)",
    )
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument(
        "--n_samples", type=int, default=-1,
        help="Number of samples to export (-1 = the whole split)",
    )
    parser.add_argument("--out", type=str, required=True)
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from .checkpoint import load_forecaster_from_checkpoint
    from .config import load_config_and_datastore
    from .dataset import WeatherDataset
    from .loader import DataLoader
    from .ops.segment import apply_matmul_precision
    from .trainer import Trainer, TrainingArgs

    apply_matmul_precision()
    config, datastore = load_config_and_datastore(args.config_path)

    load_dir = Path(args.load)
    # basename is a checkpoint name only when it is not itself a run
    # dir (a run directory happening to be NAMED "latest" holds its own
    # checkpoints/ subdir)
    if load_dir.name in ("latest", "min_val_loss") and not (
        load_dir / "checkpoints"
    ).exists():
        name, root = load_dir.name, load_dir.parent
    else:
        name, root = "latest", load_dir
    if root.name == "checkpoints":
        root = root.parent
    forecaster, params, hparams = load_forecaster_from_checkpoint(
        root, datastore, name=name
    )
    print(f"loaded checkpoint {name!r} from {root}", file=sys.stderr)

    trainer = Trainer(
        forecaster,
        config,
        datastore,
        TrainingArgs(batch_size=args.batch_size),
    )
    dataset = WeatherDataset(
        datastore,
        split=args.split,
        ar_steps=args.ar_steps,
        num_past_forcing_steps=hparams.get("num_past_forcing_steps", 1),
        num_future_forcing_steps=hparams.get(
            "num_future_forcing_steps", 1
        ),
    )
    loader = DataLoader(
        dataset, batch_size=args.batch_size, shuffle=False
    )

    # the Trainer already holds the (eps-clamped) stats its jitted
    # standardization uses — destandardize with the SAME arrays so the
    # pair stays an exact inverse even for degenerate zero-std vars
    state_mean = np.asarray(trainer.state_mean, np.float32)
    state_std = np.asarray(trainer.state_std, np.float32)

    @jax.jit
    def forecast(params, init, target, forcing):
        init_s, target_s, forcing_s = trainer.standardize_batch(
            init, target, forcing
        )
        prediction, pred_std = forecaster.forward(
            params, init_s, forcing_s, target_s
        )
        return prediction, pred_std

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    meta = {
        "split": args.split,
        "ar_steps": args.ar_steps,
        "model": hparams.get("model"),
        "var_names": list(datastore.get_vars_names("state")),
        "var_units": list(datastore.get_vars_units("state")),
        "num_grid_points": int(datastore.num_grid_points),
        "grid_shape": [
            int(datastore.grid_shape_state.x),
            int(datastore.grid_shape_state.y),
        ],
        "step_length_hours": int(
            np.asarray(datastore.step_length, dtype="timedelta64[h]")
            .astype(np.int64)
        ),
        "units": "physical (destandardized)",
    }
    (out_dir / "forecast_meta.json").write_text(
        json.dumps(meta, indent=2), encoding="utf-8"
    )

    written = 0
    limit = args.n_samples if args.n_samples >= 0 else len(dataset)
    for batch in loader:
        if written >= limit:
            break
        init, target, forcing = (np.asarray(a) for a in batch[:3])
        times = np.asarray(batch[3]) if len(batch) > 3 else None
        real = init.shape[0]
        # Single-sample dispatches pad UP to batch 2: at batch 1 the
        # node-major kernels run 64-wide lanes (half a vreg) and the
        # measured 19-step rollout is SLOWER in absolute latency than
        # a padded 2-sample dispatch (v5e: ~104 ms at B=1 vs ~97 ms at
        # B=2 — docs/performance.md "Inference / serving path").
        dispatch_batch = max(args.batch_size, 2)
        pad = dispatch_batch - real
        if pad:
            # pad the tail batch by repeating the last sample so the
            # jitted rollout keeps one static shape (a second shape
            # would pay a whole extra multi-minute TPU compile)
            rep = lambda a: np.concatenate(  # noqa: E731
                [a, np.repeat(a[-1:], pad, axis=0)], axis=0
            )
            init, target, forcing = rep(init), rep(target), rep(forcing)
        prediction, pred_std = forecast(
            params, jnp.asarray(init), jnp.asarray(target),
            jnp.asarray(forcing),
        )
        prediction = np.asarray(prediction)[:real]
        pred_std = None if pred_std is None else np.asarray(pred_std)
        for i in range(prediction.shape[0]):
            if written >= limit:
                break
            arrays = {
                "prediction": (
                    prediction[i] * state_std + state_mean
                ).astype(np.float32)
            }
            if pred_std is not None:
                arrays["pred_std"] = (
                    pred_std[i] * state_std
                ).astype(np.float32)
            if times is not None:
                arrays["target_times"] = times[i]
            np.savez_compressed(
                out_dir / f"forecast_{args.split}_{written:05d}.npz",
                **arrays,
            )
            written += 1
    print(
        f"wrote {written} forecasts to {out_dir}", file=sys.stderr
    )


if __name__ == "__main__":
    main()
