"""Training/eval harness: jitted SPMD train step, explicit loops.

Replaces the reference's PyTorch-Lightning ``ForecasterModule``
(reference: neural_lam/models/module.py:28-1014) with a small explicit
trainer:

- on-device batch standardization inside the jitted step
  (reference: module.py:307-337),
- loss = ``mean(loss_fn(pred, target, pred_std, mask=interior))``
  (reference: module.py:361-386),
- ``per_var_std = diff_std / sqrt(feature_weights)`` when the model has
  no std head (reference: module.py:142-163),
- optax AdamW with betas (0.9, 0.95) (reference: module.py:275-287),
- data parallelism via a ``jax.sharding.Mesh``: batches sharded over the
  ``data`` axis, params/optimizer state replicated; XLA inserts the
  gradient all-reduce (the DDP equivalent, SURVEY.md 2.2).
"""

from __future__ import annotations

import dataclasses
import time
import warnings
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .config import NeuralLAMConfig
from .datastore.base import BaseDatastore
from .loss_weighting import get_state_feature_weighting
from .metrics import get_metric
from .models.forecaster import ARForecaster


@dataclasses.dataclass
class TrainingArgs:
    """Training hyperparameters (subset of the reference CLI flags,
    reference: neural_lam/train_model.py:208-262)."""

    lr: float = 1e-3
    # AdamW decoupled weight decay. The reference uses
    # ``torch.optim.AdamW(params, lr=..., betas=(0.9, 0.95))``
    # (reference: models/module.py:284-287), which inherits torch's
    # default weight_decay=0.01 — NOT optax's 1e-4. Rounds 1-4 of this
    # framework trained with optax's silent 1e-4 default (100x weaker
    # regularization than the reference recipe); fixed in round 5.
    weight_decay: float = 0.01
    epochs: int = 200
    batch_size: int = 4
    ar_steps_train: int = 1
    ar_steps_eval: int = 10
    loss: str = "wmse"
    val_interval: int = 1
    val_steps_to_log: tuple[int, ...] = (1, 2, 3, 5, 10)
    # Per-validation-epoch metric promotion: watched (metric, variable,
    # lead-time) scalars appear in every validation record
    # (reference: models/module.py:806-817). Keys look like
    # ``val_rmse_<var>_step<k>``.
    metrics_watch: tuple[str, ...] = ()
    var_leads_metrics_watch: Optional[dict] = None
    # "32" (reference default) or "bf16": cast params + batch to
    # bfloat16 inside the step (f32 master params/optimizer state);
    # build the model with compute_dtype=bf16 to match.
    precision: str = "32"
    # ZeRO-1: partition AdamW moment buffers over the data axis (each
    # device keeps 1/P of the optimizer state; XLA gathers the updates).
    # Per-device optimizer memory drops ~P-fold; numerics unchanged.
    shard_opt_state: bool = True
    # Flat optimizer (optax.flatten): run AdamW on ONE raveled
    # parameter vector instead of ~150 separate tensors, collapsing the
    # per-tensor optimizer op storm (~hundreds of micro-fusions/copies
    # in the XLA tail — see docs/performance.md round-4 profile) into a
    # handful of large fused elementwise ops. AdamW is elementwise, so
    # numerics are identical (equivalence-tested); parameters total
    # only ~MBs, so the ravel/unravel concats are free. Changes the
    # opt_state pytree shape — a checkpoint written with one setting
    # restores with the same setting (the run sidecar records it).
    flat_opt: bool = False
    # jax.profiler trace capture (SURVEY.md 5.1): when set, epoch 0
    # captures steps [2, 2+profile_steps) into this directory for
    # TensorBoard/XProf.
    profile_dir: Optional[str] = None
    profile_steps: int = 5
    # Multi-host: allreduce the preemption flag every k steps so a
    # SIGTERM drains within k steps instead of a whole epoch (MEPS-size
    # epochs run thousands of steps — a SLURM grace window can expire
    # first). All hosts check at the same step index, so nobody leaves
    # peers mid-collective. 0 disables (epoch-boundary drain only).
    preempt_check_every: int = 50


def stitch_addressable_rows(arr) -> np.ndarray:
    """Reassemble this process's contiguous batch block of a sharded
    array from its addressable shards, stitching EVERY sharded axis.

    Non-batch axes may be sharded too (e.g. the grid axis under spatial
    sharding): each shard is written into its full index slice (batch
    offset by the block start), so grid shards reassemble instead of
    being dropped, and replicated-axis duplicates overwrite with
    identical data. Single-process, this equals ``np.asarray(arr)``.
    """
    norm = []
    for s in arr.addressable_shards:
        idx = tuple(
            sl.indices(dim) for sl, dim in zip(s.index, arr.shape)
        )
        norm.append((idx, np.asarray(s.data)))
    b_lo = min(i[0][0] for i, _ in norm)
    b_hi = max(i[0][1] for i, _ in norm)
    out = np.empty((b_hi - b_lo,) + arr.shape[1:], arr.dtype)
    for idx, data in norm:
        sl = (slice(idx[0][0] - b_lo, idx[0][1] - b_lo),) + tuple(
            slice(lo, hi) for lo, hi, _ in idx[1:]
        )
        out[sl] = data
    return out


def make_optimizer(
    lr: float, weight_decay: float = 0.01, flat_opt: bool = False
) -> optax.GradientTransformation:
    """The training optimizer: AdamW matching the reference recipe.

    Reference: ``torch.optim.AdamW(params, lr=..., betas=(0.9, 0.95))``
    (models/module.py:284-287) with torch's default weight_decay=0.01.
    Single source of truth for the optimizer config — the trainer and
    ``convert_checkpoint`` both build opt-state templates through here
    so their pytree shapes can never diverge (e.g. under ``flat_opt``).
    """
    opt = optax.adamw(lr, b1=0.9, b2=0.95, weight_decay=weight_decay)
    if flat_opt:
        opt = optax.flatten(opt)
    return opt


class Trainer:
    """Explicit training loop around an :class:`ARForecaster`."""

    def __init__(
        self,
        forecaster: ARForecaster,
        config: NeuralLAMConfig,
        datastore: BaseDatastore,
        args: TrainingArgs,
        mesh: Optional[Mesh] = None,
    ) -> None:
        self.forecaster = forecaster
        self.args = args
        self.datastore = datastore

        if mesh is None:
            # Largest device count that divides the GLOBAL batch size
            # (batch_size is per-host, matching the reference's
            # per-process DataLoader batch under DDP), so batch sharding
            # is always valid (a 1-device mesh if nothing fits).
            devices = jax.devices()
            n = len(devices)
            global_batch = args.batch_size * jax.process_count()
            while n > 1 and global_batch % n != 0:
                n -= 1
            if jax.process_count() > 1:
                assert n == len(devices), (
                    "multi-host runs need the per-host batch size to be "
                    "a multiple of the per-host device count"
                )
            mesh = Mesh(np.array(devices[:n]), axis_names=("data",))
        self.mesh = mesh
        self.spatial = None
        # A "spatial" axis only exists when the caller asked for spatial
        # sharding (train_model builds it for --spatial_shards > 1;
        # bench.py also for N=1, to measure the executor's single-chip
        # overhead vs the replicated path).
        if "spatial" in mesh.axis_names:
            # Spatial graph partitioning: swap the step builders for the
            # sharded executor (parallel/spatial.py); loops/eval reuse.
            from .parallel.spatial import ShardedModel

            self.spatial = ShardedModel(
                forecaster.predictor, datastore, mesh
            )
            self.num_data_shards = int(mesh.shape["data"])
            self._batch_sharding = self.spatial.node_sharding()
        else:
            self.num_data_shards = int(np.prod(mesh.devices.shape))
            self._batch_sharding = NamedSharding(mesh, P("data"))
        self._replicated = NamedSharding(mesh, P())

        # Interior mask as a static numpy bool array
        # (reference: module.py:129-140).
        boundary = np.asarray(datastore.boundary_mask.data) > 0.5
        self.interior_mask_bool = ~boundary

        # per_var_std substitute when the model has no std head
        # (reference: module.py:142-163).
        stats = datastore.get_standardization_dataarray(category="state")
        if not forecaster.predicts_std:
            weights = get_state_feature_weighting(config, datastore)
            diff_std = np.asarray(
                stats["state_diff_std_standardized"], np.float32
            )
            self.per_var_std = jnp.asarray(diff_std / np.sqrt(weights))
        else:
            self.per_var_std = None

        # Standardization stats, std clamped away from zero
        # (reference: module.py:289-305).
        eps = np.finfo(np.float32).eps
        self.state_mean = jnp.asarray(
            np.asarray(stats["state_mean"], np.float32)
        )
        self.state_std = jnp.asarray(
            np.maximum(np.asarray(stats["state_std"], np.float32), eps)
        )
        # Only request forcing stats when the datastore has forcing vars;
        # stores without a forcing category raise on the lookup
        # (reference guards identically, module.py:183).
        if datastore.get_num_data_vars("forcing") > 0:
            f_stats = datastore.get_standardization_dataarray(
                category="forcing"
            )
        else:
            f_stats = {}
        self._forcing_mean_raw = np.asarray(
            f_stats.get("forcing_mean", np.zeros(0)), np.float32
        )
        self._forcing_std_raw = np.maximum(
            np.asarray(f_stats.get("forcing_std", np.ones(0)), np.float32),
            eps,
        )

        self.loss_fn = get_metric(args.loss)
        self.optimizer = make_optimizer(
            args.lr,
            weight_decay=getattr(args, "weight_decay", 0.01),
            flat_opt=args.flat_opt,
        )

        self._train_step = None
        self._eval_step: dict[int, Callable] = {}

        # Preemption flag: set by install_preemption_handler's signal
        # handler (SLURM/TPU-maintenance SIGTERM); fit() drains the
        # current work and returns early so the caller can write a
        # rescue checkpoint before the kill escalates (the idiomatic
        # TPU addition to the reference's every-epoch rescue policy,
        # SURVEY.md 5.3; reference: train_model.py:500-516).
        import threading

        self.preempt_event = threading.Event()

    def install_preemption_handler(self, signals=None) -> None:
        """Install SIGTERM/SIGUSR1 handlers that request a graceful stop.

        Single-host, the training loop stops at the next step. Multi-host
        it stops within ``preempt_check_every`` steps: an uncoordinated
        per-step break would deadlock the SPMD peers mid-collective when
        the signal lands at different step indices on different hosts
        (SLURM delivers to all tasks, but not atomically), so the loop
        allreduces the flag at fixed step indices and every host breaks
        at the same point.
        """
        import signal as signal_mod

        if signals is None:
            signals = (signal_mod.SIGTERM, signal_mod.SIGUSR1)

        def handler(signum, frame):
            self.preempt_event.set()

        for s in signals:
            signal_mod.signal(s, handler)

    def _sync_preempt_flag(self) -> bool:
        """Multi-host: allgather the local preemption bit so every host
        agrees; sets the local event when ANY host was signalled.
        Returns the agreed flag. Single-host: the local flag."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            flags = np.asarray(
                multihost_utils.process_allgather(
                    np.int32(self.preempt_event.is_set())
                )
            )
            if flags.any():
                self.preempt_event.set()
        return self.preempt_event.is_set()

    # -- batch prep --------------------------------------------------------
    def _tiled_forcing_stats(self, forcing_width: int):
        """Per-window tiling of forcing stats, feature-major
        (reference: module.py:307-337)."""
        n_f = self._forcing_mean_raw.shape[-1]
        if forcing_width == 0 or n_f == 0:
            return (
                jnp.zeros((forcing_width,), jnp.float32),
                jnp.ones((forcing_width,), jnp.float32),
            )
        window = forcing_width // n_f
        return (
            jnp.asarray(np.repeat(self._forcing_mean_raw, window)),
            jnp.asarray(np.repeat(self._forcing_std_raw, window)),
        )

    def standardize_batch(self, init_states, target_states, forcing):
        """On-device standardization of state and forcing.

        KEEP IN SYNC with ``parallel.spatial.ShardedModel._standardize``
        (same stats + feature-major window repeat); the sharded executor
        re-implements this on its local views.
        """
        init_states = (init_states - self.state_mean) / self.state_std
        target_states = (target_states - self.state_mean) / self.state_std
        if forcing.shape[-1] > 0:
            f_mean, f_std = self._tiled_forcing_stats(forcing.shape[-1])
            forcing = (forcing - f_mean) / f_std
        return init_states, target_states, forcing

    def device_put_batch(self, batch: tuple) -> tuple[tuple, int]:
        """Move a host batch to devices with batch-axis sharding.

        Partial batches (eval tails; the explicit per-host analog of the
        reference's DistributedSampler padding caveat, README.md:528-530)
        are padded up to a multiple of the mesh size by repeating the
        final sample; returns ``(device_batch, real_batch_size)`` so
        callers can drop padded rows from metrics.
        """
        real = int(np.asarray(batch[0]).shape[0])
        n_proc = jax.process_count()
        # Local padding target: under multi-host SPMD every process
        # contributes an equal slice of the global batch, so the local
        # batch must pad to (global data shards / processes).
        n_shards = max(self.num_data_shards // n_proc, 1)
        pad = (-real) % n_shards
        out = []
        for a in batch[:3]:
            a = np.asarray(a)
            if pad:
                a = np.concatenate(
                    [a, np.repeat(a[-1:], pad, axis=0)], axis=0
                )
            if self.spatial is not None:
                a = self.spatial.pad_grid(a)
            if n_proc > 1:
                # Assemble the global array from per-process local data
                # (each host's loader shard is its slice of the global
                # batch; jax.device_put of a global array would be wrong
                # across hosts).
                out.append(
                    jax.make_array_from_process_local_data(
                        self._batch_sharding, a
                    )
                )
            else:
                out.append(jax.device_put(a, self._batch_sharding))
        return tuple(out), real

    def device_prefetch(self, loader, depth: int = 2):
        """Iterate ``(device_batch, real_batch_size)`` with host->device
        transfer overlapped ahead of compute (the double-buffering that
        replaces DataLoader worker pipelining, SURVEY.md §7)."""
        import threading
        import queue as queue_mod

        q: queue_mod.Queue = queue_mod.Queue(maxsize=depth)
        sentinel = object()
        stop = threading.Event()
        err: list[BaseException] = []

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue_mod.Full:
                    continue
            return False

        def producer():
            try:
                for batch in loader:
                    if stop.is_set():
                        return
                    if not put(self.device_put_batch(batch)):
                        return
            except BaseException as e:
                err.append(e)
            finally:
                put(sentinel)

        t = threading.Thread(
            target=producer, daemon=True, name="neural-lam-prefetch"
        )
        t.start()
        self.input_wait_seconds = 0.0
        try:
            while True:
                t0 = time.perf_counter()
                item = q.get()
                # time the consumer spent blocked on the input pipeline —
                # when this grows, grid_points_per_s under-reports device
                # throughput (the wall-clock counter includes host loading)
                self.input_wait_seconds += time.perf_counter() - t0
                if item is sentinel:
                    break
                yield item
        finally:
            # Also reached when the consumer abandons the generator
            # early (preemption break, a raising train step): unblock
            # the producer so queued device batches are released instead
            # of staying pinned behind a forever-blocked q.put.
            stop.set()
            try:
                while True:
                    q.get_nowait()
            except queue_mod.Empty:
                pass
            t.join(timeout=10.0)
        if err:
            raise err[0]

    # -- steps -------------------------------------------------------------
    def _loss(self, params, init_states, target_states, forcing):
        init_states, target_states, forcing = self.standardize_batch(
            init_states, target_states, forcing
        )
        if self.args.precision == "bf16":
            # f32 master params; bf16 compute copies inside the step.
            # The model casts activations itself (compute_dtype).
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16), params
            )
        prediction, pred_std = self.forecaster.forward(
            params, init_states, forcing, target_states
        )
        prediction = prediction.astype(jnp.float32)
        if pred_std is None:
            pred_std = self.per_var_std
        return jnp.mean(
            self.loss_fn(
                prediction,
                target_states,
                pred_std,
                mask=self.interior_mask_bool,
            )
        )

    def make_train_step(self, scan_steps: Optional[int] = None) -> Callable:
        """Build the jitted, donated ``(params, opt_state, batch) ->
        (params, opt_state, loss)`` step.

        With ``scan_steps=k`` the returned callable consumes a STACK of
        ``k`` batches (leading axis ``k`` on every batch array) and runs
        ``k`` sequential optimizer steps inside one executable via
        ``lax.scan``, returning the ``(k,)`` per-step losses. One device
        dispatch then covers ``k`` steps, which removes the per-dispatch
        host/runtime gap between steps — significant on deployments with
        slow dispatch paths (the remote-tunnel dev chip pays ~3 ms per
        program launch; see docs/performance.md).
        """
        if self.spatial is not None:
            out_shardings = None
            if getattr(self, "_opt_shardings", None) is not None:
                # ZeRO-1 under spatial sharding: pin moment shardings
                # across steps like the replicated path does
                out_shardings = (
                    self._replicated,
                    self._opt_shardings,
                    self._replicated,
                )
            return self.spatial.make_train_step(
                self.forecaster,
                self.optimizer,
                self.per_var_std,
                loss_name=self.args.loss,
                scan_steps=scan_steps,
                precision=self.args.precision,
                out_shardings=out_shardings,
            )

        def train_step(params, opt_state, init, target, forcing):
            loss, grads = jax.value_and_grad(self._loss)(
                params, init, target, forcing
            )
            updates, opt_state = self.optimizer.update(
                grads, opt_state, params
            )
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        # Pin output shardings so AdamW moments stay data-axis sharded
        # across steps (ZeRO-1) instead of being re-replicated.
        out_shardings = None
        if getattr(self, "_opt_shardings", None) is not None:
            out_shardings = (
                self._replicated,
                self._opt_shardings,
                self._replicated,
            )

        if scan_steps:

            def train_steps(params, opt_state, init_k, target_k, forcing_k):
                def body(carry, batch):
                    p, o = carry
                    p, o, loss = train_step(p, o, *batch)
                    return (p, o), loss

                (params, opt_state), losses = jax.lax.scan(
                    body,
                    (params, opt_state),
                    (init_k, target_k, forcing_k),
                )
                return params, opt_state, losses

            return jax.jit(
                train_steps,
                donate_argnums=(0, 1),
                out_shardings=out_shardings,
            )

        return jax.jit(
            train_step,
            donate_argnums=(0, 1),
            out_shardings=out_shardings,
        )

    def make_eval_step(self, pred_steps: int) -> Callable:
        """Jitted eval: returns total loss plus per-unroll-step losses
        (reference: module.py:465-477)."""
        if self.spatial is not None:
            return self.spatial.make_eval_step(
                self.forecaster,
                self.per_var_std,
                self.args.loss,
                self.args.val_steps_to_log,
                pred_steps,
                watch_tables=self._watched_tables(),
            )
        steps_to_log = [
            s for s in self.args.val_steps_to_log if s <= pred_steps
        ]

        def eval_step(params, init, target, forcing):
            init_s, target_s, forcing_s = self.standardize_batch(
                init, target, forcing
            )
            prediction, pred_std = self.forecaster.forward(
                params, init_s, forcing_s, target_s
            )
            if pred_std is None:
                pred_std = self.per_var_std
            time_step_loss = self.loss_fn(
                prediction,
                target_s,
                pred_std,
                mask=self.interior_mask_bool,
                average_grid=True,
                sum_vars=True,
            )  # (B, pred_steps) per-sample so padded rows can be dropped
            out = {"loss": jnp.mean(time_step_loss, axis=-1)}
            for s in steps_to_log:
                out[f"loss_unroll{s}"] = time_step_loss[:, s - 1]
            # standardized per-(step, var) tables for watch promotion
            for key in self._watched_tables():
                table_std = (
                    pred_std if key == "wmae" else jnp.float32(1.0)
                )
                out[f"{key}_table"] = get_metric(key)(
                    prediction,
                    target_s,
                    table_std,
                    mask=self.interior_mask_bool,
                    average_grid=True,
                    sum_vars=False,
                )  # (B, T, d)
            return out

        return jax.jit(eval_step)

    def _watched_tables(self) -> tuple[str, ...]:
        """Per-(step, var) metric tables the val eval step must compute
        for ``--metrics_watch`` promotion: ``mse`` covers the rmse/mse
        watches (rmse = sqrt(mse) rescaled), ``mae``/``wmae`` their own
        (reference promotes from every computed metric table,
        module.py:806-817)."""
        if not self.args.metrics_watch:
            return ()
        watch = {m.split("_")[-1] for m in self.args.metrics_watch}
        tables = []
        if watch & {"rmse", "mse"} or not watch & {"mae", "wmae"}:
            # default table: an unrecognised watch entry still warns
            # from the mse-table promotion path
            tables.append("mse")
        if "mae" in watch:
            tables.append("mae")
        if "wmae" in watch:
            tables.append("wmae")
        return tuple(tables)

    # -- loops -------------------------------------------------------------
    def _opt_state_sharding(self, opt_state) -> Any:
        """Per-leaf shardings partitioning AdamW moments over the device
        mesh (the FSDP-lite/ZeRO-1 cheap win, SURVEY.md 2.2): a leaf
        shards over ALL mesh axes whose product divides its leading
        axis (data, and spatial when present — the moments are
        parameter-shaped, not node arrays, so any axis works), falling
        back to the data axis alone, else replicated (scalars like the
        step count)."""
        axes = tuple(
            a for a in ("data", "spatial") if a in self.mesh.axis_names
        )
        candidates = []
        if axes:
            total = int(np.prod([self.mesh.shape[a] for a in axes]))
            if total > 1:
                candidates.append((total, P(axes)))
        if "data" in self.mesh.axis_names:
            d = int(self.mesh.shape["data"])
            if d > 1:
                candidates.append((d, P("data")))

        def leaf_sharding(leaf):
            if (
                self.args.shard_opt_state
                and hasattr(leaf, "ndim")
                and leaf.ndim >= 1
                and leaf.shape[0] > 0
            ):
                for size, spec in candidates:
                    if leaf.shape[0] % size == 0:
                        return NamedSharding(self.mesh, spec)
            return self._replicated

        return jax.tree_util.tree_map(leaf_sharding, opt_state)

    def init_state(self, rng: jax.Array) -> tuple[Any, Any]:
        """Initialise params (replicated) and optimizer state
        (moments sharded over the data axis when enabled)."""
        params = self.forecaster.init_params(rng)
        opt_state = self.optimizer.init(params)
        self._opt_shardings = self._opt_state_sharding(opt_state)
        return self.place_state(params, opt_state)

    def place_state(self, params, opt_state) -> tuple[Any, Any]:
        """Place (possibly checkpoint-restored host numpy) state on the
        mesh with the trainer's shardings: params replicated, optimizer
        moments data-axis sharded (ZeRO-1). Restored state MUST pass
        through here before ``fit`` — the jitted step pins these
        shardings on its donated buffers."""
        params = jax.device_put(params, self._replicated)
        if getattr(self, "_opt_shardings", None) is not None:
            opt_state = jax.tree_util.tree_map(
                jax.device_put, opt_state, self._opt_shardings
            )
        else:
            opt_state = jax.device_put(opt_state, self._replicated)
        return params, opt_state

    def fit(
        self,
        params,
        opt_state,
        train_loader,
        val_loader=None,
        epochs: Optional[int] = None,
        log_fn: Optional[Callable[[dict], None]] = None,
        start_epoch: int = 0,
    ):
        """Run the training loop; returns final ``(params, opt_state,
        history)``."""
        if self._train_step is None:
            self._train_step = self.make_train_step()
        epochs = self.args.epochs if epochs is None else epochs
        history = []
        profiling = False
        for epoch in range(start_epoch, start_epoch + epochs):
            train_loader.set_epoch(epoch)
            t0 = time.perf_counter()
            losses = []
            n_samples = 0
            for step_idx, (device_batch, real) in enumerate(
                self.device_prefetch(train_loader)
            ):
                n_shards = max(
                    self.num_data_shards // jax.process_count(), 1
                )
                if real % n_shards != 0 and not getattr(
                    self, "_warned_padded_train", False
                ):
                    self._warned_padded_train = True
                    warnings.warn(
                        "Partial train batch padded by repeating the "
                        "last sample, which then carries extra weight "
                        "in that step's gradient (the reference's "
                        "DistributedSampler duplicates samples the same "
                        "way). Pass drop_last=True to the train loader "
                        "to skip ragged tails instead.",
                        stacklevel=2,
                    )
                if (
                    self.args.profile_dir
                    and epoch == start_epoch
                    and step_idx == 2
                ):
                    jax.profiler.start_trace(self.args.profile_dir)
                    profiling = True
                params, opt_state, loss = self._train_step(
                    params, opt_state, *device_batch
                )
                losses.append(loss)
                n_samples += real
                if (
                    profiling
                    and step_idx == 2 + self.args.profile_steps - 1
                ):
                    jax.block_until_ready(loss)
                    jax.profiler.stop_trace()
                    profiling = False
                if (
                    self.preempt_event.is_set()
                    and jax.process_count() == 1
                ):
                    break
                k = self.args.preempt_check_every
                if (
                    jax.process_count() > 1
                    and k > 0
                    and step_idx % k == k - 1
                ):
                    # Coordinated drain: every host contributes its
                    # local flag at the same step index; if ANY host was
                    # signalled, all break together (no peer is left
                    # blocked in a collective). Loaders yield the same
                    # batch count per host, so the check points line up.
                    if self._sync_preempt_flag():
                        break
            if profiling:  # short epoch: close the trace cleanly
                jax.profiler.stop_trace()
                profiling = False
            # Epoch-boundary flag sync: a signal landing AFTER the
            # epoch's last mid-epoch checkpoint would otherwise be seen
            # by one host only — it would skip validation/break while
            # its peers enter the next collective and block. Every host
            # reaches this point (mid-epoch breaks are coordinated), so
            # one allgather here closes the window.
            self._sync_preempt_flag()
            if losses:
                jax.block_until_ready(losses[-1])
                train_loss = float(jnp.mean(jnp.stack(losses)))
            else:
                # zero-batch epoch (empty shard, drop_last on a tiny
                # dataset): record NaN instead of crashing the run
                train_loss = float("nan")
            epoch_seconds = time.perf_counter() - t0
            num_grid = getattr(
                self.datastore, "num_grid_points", 0
            )
            record = {
                "epoch": epoch,
                "train_loss": train_loss,
                "epoch_seconds": epoch_seconds,
                # host time spent blocked waiting for input batches; when
                # this dominates, the wall-clock throughput below stops
                # reflecting device speed (bench.py is the honest number)
                "input_wait_seconds": round(
                    getattr(self, "input_wait_seconds", 0.0), 3
                ),
                # the north-star throughput counter (SURVEY.md 5.1)
                "grid_points_per_s": (
                    n_samples
                    * num_grid
                    * self.args.ar_steps_train
                    / max(epoch_seconds, 1e-9)
                ),
            }
            if self.preempt_event.is_set():
                record["preempted"] = True
            if (
                val_loader is not None
                and (epoch + 1) % self.args.val_interval == 0
                and not self.preempt_event.is_set()
            ):
                record.update(self.evaluate(params, val_loader, "val"))
            history.append(record)
            if log_fn is not None:
                log_fn(record)
            if self.preempt_event.is_set():
                break
        return params, opt_state, history

    @staticmethod
    def _local_batch_rows(arr) -> np.ndarray:
        """This process's rows of a batch-sharded per-sample array, in
        batch order. Under multi-host the global batch is assembled from
        contiguous per-host blocks (``make_array_from_process_local_data``),
        so the addressable shards ARE this host's samples."""
        if jax.process_count() == 1:
            return np.asarray(arr)
        return stitch_addressable_rows(arr)

    @staticmethod
    def _merge_host_sums(
        sums: dict, count: int
    ) -> tuple[dict, int]:
        """ONE collective per eval pass: flatten per-host metric sums +
        the sample count, allgather, sum over hosts — every process
        ends with identical totals. No-op single-host or on empty
        sums."""
        if jax.process_count() == 1 or not sums:
            return sums, count
        from jax.experimental import multihost_utils

        keys = sorted(sums)
        shapes = {k: np.shape(sums[k]) for k in keys}
        flat = np.concatenate(
            [np.ravel(np.asarray(sums[k], np.float64)) for k in keys]
            + [np.array([count], np.float64)]
        )
        gathered = np.asarray(
            multihost_utils.process_allgather(flat)
        ).reshape(jax.process_count(), -1)
        total = gathered.sum(axis=0)
        off = 0
        merged = {}
        for k in keys:
            size = int(np.prod(shapes[k])) if shapes[k] else 1
            merged[k] = total[off : off + size].reshape(shapes[k])
            off += size
        return merged, int(round(total[-1]))

    def evaluate(self, params, loader, prefix: str = "val") -> dict:
        """Mean eval metrics over a loader.

        Multi-host: per-batch sums accumulate from each host's OWN
        (addressable) rows with no collective in the loop; one
        ``process_allgather`` per eval pass merges the per-host
        sums+counts, so every process computes identical means
        (reference metric sync: module.py:399-418, minus its per-step
        gather round-trips).
        """
        pred_steps = None
        sums: dict[str, np.ndarray] = {}
        count = 0
        for batch in loader:
            device_batch, real = self.device_put_batch(batch)
            if pred_steps is None:
                pred_steps = int(batch[1].shape[1])
                if pred_steps not in self._eval_step:
                    self._eval_step[pred_steps] = self.make_eval_step(
                        pred_steps
                    )
            out = self._eval_step[pred_steps](params, *device_batch)
            for k, v in out.items():
                # padded tail rows (repeated last sample) sit at the
                # end of this host's block; mask by the real count
                rows = self._local_batch_rows(v)[:real]
                sums[k] = sums.get(k, 0.0) + rows.sum(axis=0)
            count += real
        sums, count = self._merge_host_sums(sums, count)
        means = {k: v / max(count, 1) for k, v in sums.items()}
        tables = {
            k[: -len("_table")]: means.pop(k)
            for k in [k for k in means if k.endswith("_table")]
        }
        result = {
            f"{prefix}_{k}": float(v) for k, v in means.items()
        }
        if tables:
            result.update(
                self._promote_watched_metrics(tables, prefix)
            )
        return result

    def _promote_watched_metrics(
        self, tables: dict, prefix: str
    ) -> dict:
        """Per-epoch (metric, variable, lead) scalars from the
        standardized per-(step, var) metric tables: rmse/mae in physical
        units (rescaled by the state std, rmse = sqrt(mse)), mse
        standardized, wmae as computed (per_var_std-weighted)
        (reference: models/module.py:806-817)."""
        out: dict = {}
        watch = {m.split("_")[-1] for m in self.args.metrics_watch}
        unsupported = watch - {"rmse", "mse", "mae", "wmae"}
        if unsupported and not getattr(self, "_warned_watch", False):
            self._warned_watch = True
            warnings.warn(
                f"metrics_watch entries {sorted(unsupported)} are not "
                "promoted per epoch — only rmse/mse/mae/wmae scalars "
                "are derived from the per-(step, var) metric tables. "
                "Other metrics are available from the full test-phase "
                "evaluation.",
                stacklevel=2,
            )
        var_names = list(self.datastore.get_vars_names("state"))
        state_std = np.asarray(self.state_std)
        promoted: dict[str, np.ndarray] = {}
        if "mse" in tables:
            mse_std = np.asarray(tables["mse"])
            if "rmse" in watch:
                promoted["rmse"] = np.sqrt(mse_std) * state_std
            if "mse" in watch:
                promoted["mse"] = mse_std
        if "mae" in tables and "mae" in watch:
            promoted["mae"] = np.asarray(tables["mae"]) * state_std
        if "wmae" in tables and "wmae" in watch:
            promoted["wmae"] = np.asarray(tables["wmae"])
        var_leads = self.args.var_leads_metrics_watch or {}
        for var, leads in var_leads.items():
            if var not in var_names:
                continue
            vi = var_names.index(var)
            for lead in leads:
                for name, table in promoted.items():
                    if lead > table.shape[0]:
                        continue
                    out[f"{prefix}_{name}_{var}_step{lead}"] = float(
                        table[lead - 1, vi]
                    )
        return out
