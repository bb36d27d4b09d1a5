"""Test-phase evaluation: metric tables, heatmaps, spatial maps, examples.

Counterpart of the reference's ``test_step`` / ``on_test_epoch_end``
artifact pipeline (reference: neural_lam/models/module.py:511-962):

- per-(unroll step, variable) MSE/MAE accumulated over the test set,
  converted to RMSE and rescaled to physical units by the state std,
- per-grid-node spatial loss maps averaged over the test set,
- CSV tables + heatmap/spatial figures via ``vis``,
- example prediction/target map plots for the first samples.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import jax
import numpy as np

from . import vis
from .loggers import BaseLogger, NullLogger
from .metrics import mae as mae_metric
from .metrics import mse as mse_metric
from .metrics import wmae as wmae_metric


def _write_prediction_gif(
    pred_t, target_t, datastore, var_name, path
) -> None:
    """Animate prediction vs target over lead time as a GIF
    (reference: module.py:600-768 ``--create_gif``)."""
    from PIL import Image

    vmin = float(min(pred_t.min(), target_t.min()))
    vmax = float(max(pred_t.max(), target_t.max()))
    frames = []
    for t in range(pred_t.shape[0]):
        fig = vis.plot_prediction(
            pred_t[t], target_t[t], datastore,
            title=f"{var_name} t={t + 1}", vrange=(vmin, vmax),
        )
        fig.canvas.draw()
        frames.append(
            Image.fromarray(
                np.asarray(fig.canvas.buffer_rgba())
            ).convert("RGB")
        )
        vis.plt.close(fig)
    frames[0].save(
        path,
        save_all=True,
        append_images=frames[1:],
        duration=500,
        loop=0,
    )


def run_test_evaluation(
    trainer,
    params,
    loader,
    datastore,
    run_dir: str | Path,
    logger: Optional[BaseLogger] = None,
    split: str = "test",
    n_example_pred: int = 1,
    spatial_steps: tuple[int, ...] = (1, -1),
    create_gif: bool = False,
    metrics_watch: Optional[list[str]] = None,
    var_leads_metrics_watch: Optional[dict] = None,
) -> dict:
    """Full evaluation with artifacts; returns the scalar metrics dict."""
    run_dir = Path(run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)
    logger = logger or NullLogger()

    interior = trainer.interior_mask_bool
    stats = datastore.get_standardization_dataarray(category="state")
    state_mean = np.asarray(stats["state_mean"], np.float32)
    state_std = np.asarray(stats["state_std"], np.float32)

    @jax.jit
    def eval_batch(params, init, target, forcing):
        init_s, target_s, forcing_s = trainer.standardize_batch(
            init, target, forcing
        )
        if trainer.spatial is not None:
            # batches arrive grid-padded and spatially sharded; the
            # sharded rollout returns the global, unpadded prediction
            prediction, pred_std = trainer.spatial.forward(
                params, trainer.forecaster, init_s, forcing_s, target_s
            )
            target_s = target_s[..., : trainer.spatial.n_grid, :]
        else:
            prediction, pred_std = trainer.forecaster.forward(
                params, init_s, forcing_s, target_s
            )
        if pred_std is None:
            pred_std = trainer.per_var_std
        loss = trainer.loss_fn(
            prediction, target_s, pred_std, mask=interior
        )  # (B, T)
        mse_sv = mse_metric(
            prediction, target_s, pred_std, mask=interior, sum_vars=False
        )  # (B, T, d)
        mae_sv = mae_metric(
            prediction, target_s, pred_std, mask=interior, sum_vars=False
        )
        # wmae table so --metrics_watch wmae works in the test phase
        # too (the per-epoch promoter supports it and its warning
        # routes users here; trainer.py _promote_watched_metrics)
        wmae_sv = wmae_metric(
            prediction, target_s, pred_std, mask=interior, sum_vars=False
        )
        # Spatial loss: per grid node, summed over vars, kept per-sample
        # so padded tail rows can be sliced off on the host
        # (reference: module.py:571-582 with average_grid=False).
        spatial = trainer.loss_fn(
            prediction, target_s, pred_std,
            mask=None, average_grid=False, sum_vars=True,
        )  # (B, T, N)
        return loss, mse_sv, mae_sv, wmae_sv, spatial, prediction

    is_rank_zero = jax.process_index() == 0
    sums: dict[str, np.ndarray] = {}
    count = 0
    example_plotted = 0
    pred_steps = None
    for batch in loader:
        device_batch, real = trainer.device_put_batch(batch)
        loss, mse_sv, mae_sv, wmae_sv, spatial, prediction = eval_batch(
            params, *device_batch
        )
        if pred_steps is None:
            pred_steps = int(loss.shape[1])
        per_batch = (
            ("loss", loss), ("mse", mse_sv), ("mae", mae_sv),
            ("wmae", wmae_sv), ("spatial", spatial),
        )
        # Each host accumulates its OWN (addressable) rows, masked to
        # its real count — NO collective in the loop; one
        # process_allgather below merges per-host sums
        # (reference metric sync: module.py:399-418, batched).
        for key, val in per_batch:
            rows = trainer._local_batch_rows(val)[:real]
            sums[key] = sums.get(key, 0) + rows.sum(axis=0)
        count += real

        # Example prediction plots from the first batch(es)
        # (reference: module.py:584-768). Multi-host: the global batch
        # leads with host 0's block, so the globally-first samples ARE
        # rank 0's addressable rows — plot on rank 0 from its own
        # shard, no gather needed. batch[1] (targets) is host-local and
        # row-aligned with those rows.
        plot_here = n_example_pred > 0 and (
            jax.process_count() == 1 or is_rank_zero
        )
        pred_local = (
            trainer._local_batch_rows(prediction) if plot_here else None
        )
        n_plot = (
            min(n_example_pred - example_plotted, real)
            if plot_here
            else 0
        )
        for i in range(n_plot):
            ex = example_plotted + i  # global example index for naming
            pred_phys = (
                pred_local[i] * state_std + state_mean
            )  # (T, N, d)
            target_phys = np.asarray(batch[1])[i]
            t_last = pred_steps - 1
            var_names = datastore.get_vars_names("state")
            var_units = datastore.get_vars_units("state")
            for v, (name, unit) in enumerate(zip(var_names, var_units)):
                fig = vis.plot_prediction(
                    pred_phys[t_last, :, v],
                    target_phys[t_last, :, v],
                    datastore,
                    title=(
                        f"{name} ({unit}), "
                        f"t={(t_last + 1)} steps"
                    ),
                )
                logger.log_image(
                    f"{split}_example_{ex}/{name}", fig, step=t_last + 1
                )
                vis.plt.close(fig)
                if create_gif:
                    _write_prediction_gif(
                        pred_phys[:, :, v],
                        target_phys[:, :, v],
                        datastore,
                        name,
                        run_dir
                        / f"{split}_example_{ex}_{name}.gif",
                    )
        example_plotted += n_plot

    if count == 0 or pred_steps is None:
        raise ValueError(
            f"{split} loader yielded no batches — the split's time axis "
            "is too short for the requested ar_steps/forcing window "
            "(dataset length formula: T - (max(2, past) + ar + future) "
            "+ 1)"
        )

    # ONE collective per eval pass merges per-host sums + counts
    # (artifacts stay rank-0-only below).
    sums, count = trainer._merge_host_sums(sums, count)

    mean_loss_per_step = sums["loss"] / count  # (T,)
    mse_per_step_var = sums["mse"] / count  # (T, d)
    mae_per_step_var = sums["mae"] / count
    spatial_mean = sums["spatial"] / count  # (T, N)

    # Physical-unit RMSE/MAE (reference: module.py:837-858)
    rmse_phys = np.sqrt(mse_per_step_var) * state_std
    mae_phys = mae_per_step_var * state_std

    metrics = {f"{split}_loss": float(mean_loss_per_step.mean())}
    for s in trainer.args.val_steps_to_log:
        if s <= len(mean_loss_per_step):
            metrics[f"{split}_loss_unroll{s}"] = float(
                mean_loss_per_step[s - 1]
            )

    # Promote watched (metric, variable, lead time) scalars
    # (reference: module.py:806-817).
    if metrics_watch:
        var_names = datastore.get_vars_names("state")
        # same table set + unit conventions as the per-epoch promoter
        # (trainer._promote_watched_metrics): rmse/mae physical,
        # mse standardized, wmae as computed (per_var_std-weighted)
        tables = {
            "rmse": rmse_phys,
            "mae": mae_phys,
            "mse": mse_per_step_var,
            "wmae": sums["wmae"] / count,
        }
        for watched in metrics_watch:
            key = watched.split("_")[-1]
            table = tables.get(key)
            if table is None:
                continue
            for var, leads in (var_leads_metrics_watch or {}).items():
                if var not in var_names:
                    continue
                v = var_names.index(var)
                for lead in leads:
                    if 1 <= lead <= table.shape[0]:
                        metrics[f"{split}_{key}_{var}_step{lead}"] = (
                            float(table[lead - 1, v])
                        )

    # Artifacts (rank-0 only: sums are identical on every process)
    if not is_rank_zero:
        return metrics
    vis.save_metrics_csv(rmse_phys, datastore, run_dir / f"{split}_rmse.csv")
    vis.save_metrics_csv(mae_phys, datastore, run_dir / f"{split}_mae.csv")
    for name, table in (("rmse", rmse_phys), ("mae", mae_phys)):
        fig = vis.plot_error_heatmap(
            table, datastore, title=f"{split} {name.upper()}"
        )
        fig.savefig(run_dir / f"{split}_{name}_heatmap.pdf")
        logger.log_image(f"{split}_{name}_heatmap", fig)
        vis.plt.close(fig)

    for step in spatial_steps:
        idx = step - 1 if step > 0 else pred_steps + step
        if not 0 <= idx < pred_steps:
            continue
        fig = vis.plot_spatial_error(
            spatial_mean[idx],
            datastore,
            title=f"{split} spatial loss, step {idx + 1}",
        )
        fig.savefig(run_dir / f"{split}_spatial_loss_step{idx + 1}.pdf")
        logger.log_image(f"{split}_spatial_loss", fig, step=idx + 1)
        vis.plt.close(fig)
    np.save(run_dir / "mean_spatial_loss.npy", spatial_mean)

    (run_dir / f"{split}_metrics.json").write_text(
        json.dumps(metrics, indent=2), encoding="utf-8"
    )
    logger.log_metrics(metrics)
    return metrics
