"""Train/eval CLI: ``python -m neural_lam_tpu.train_model``.

Mirrors the reference CLI flag set
(reference: neural_lam/train_model.py:76-548) on top of the explicit JAX
trainer. Rank/device flags from the DDP world are replaced by the JAX
SPMD equivalents (a single process drives all local devices; multi-host
runs call ``jax.distributed.initialize`` when ``--multihost`` is set).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

from . import utils
from .checkpoint import CheckpointManager
from .config import load_config_and_datastore
from .dataset import WeatherDataset
from .loader import DataLoader
from .metrics import DEFINED_METRICS
from .models import MODELS, ARForecaster
from .trainer import Trainer, TrainingArgs


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Train or evaluate neural-lam-tpu models",
    )
    core = parser.add_argument_group("Core Configuration")
    core.add_argument(
        "--config_path",
        type=str,
        help="Path to the configuration for neural-lam-tpu",
    )
    core.add_argument(
        "--model",
        type=str,
        default="graph_lam",
        choices=sorted(MODELS),
        help="Model architecture to train/evaluate",
    )
    core.add_argument("--seed", type=int, default=42, help="random seed")

    runtime = parser.add_argument_group("Runtime & Device Settings")
    runtime.add_argument(
        "--multihost",
        action="store_true",
        help="Initialise jax.distributed for a multi-host slice",
    )
    runtime.add_argument(
        "--devices",
        type=int,
        default=None,
        help="Cap the number of local devices used for the data mesh "
        "(reference: Lightning's --devices; default: every device "
        "whose count divides the batch)",
    )
    runtime.add_argument(
        "--num_nodes",
        type=int,
        default=None,
        help="Expected number of hosts; validated against the "
        "discovered jax.distributed process count (the reference "
        "passes it to Lightning DDP; JAX discovers it, so this is a "
        "launch-config sanity check)",
    )
    runtime.add_argument(
        "--num_workers",
        type=int,
        default=2,
        help="Loader prefetch depth (the counterpart of the "
        "reference's DataLoader worker count; loading here is "
        "memmap-backed threads, not worker processes)",
    )
    runtime.add_argument(
        "--debug_nans",
        action="store_true",
        help="Enable jax.debug_nans: error out on the first NaN/Inf "
        "produced by any jitted computation (the counterpart of the "
        "reference's detect_anomaly NaN tripwire, reference: "
        "tests/test_training.py:77). Slows training; use to localise "
        "numerical blowups",
    )
    runtime.add_argument(
        "--spatial_shards",
        type=int,
        default=1,
        help="Shard grid+mesh nodes over this many devices (the "
        "'spatial' mesh axis; remaining devices form the data axis). "
        "1 = replicate the graph like the reference",
    )
    runtime.add_argument(
        "--precision",
        type=str,
        default="32",
        choices=["32", "bf16"],
        help="Numerical precision for compute (32/bf16)",
    )
    runtime.add_argument(
        "--load",
        type=str,
        help="Run dir or checkpoint dir to load model parameters from",
    )
    runtime.add_argument(
        "--restore_opt",
        action="store_true",
        help="If optimizer state should be restored with model",
    )
    runtime.add_argument(
        "--flat_opt",
        action="store_true",
        help="Run AdamW on one raveled parameter vector (optax.flatten)"
        ": identical numerics, collapses the per-tensor optimizer op "
        "storm in the XLA tail (~+1%% step time, within run noise on "
        "v5e). Changes the opt_state pytree shape; restore checkpoints "
        "with the same setting.",
    )
    runtime.add_argument(
        "--profile_dir",
        type=str,
        default=None,
        help="Capture a jax.profiler trace of a few training steps "
        "into this directory (view with TensorBoard/XProf)",
    )

    kernels = parser.add_argument_group(
        "TPU Kernel Tuning",
        "Each flag maps to a NEURAL_LAM_TPU_* env var (the env var, when "
        "set explicitly, wins — an escape hatch for sweeps). Defaults "
        "are the measured-fastest configuration; see "
        "docs/performance.md.",
    )
    kernels.add_argument(
        "--pallas",
        choices=["auto", "off", "interpret"],
        default=None,
        help="Pallas aggregation kernels: auto (on for TPU backends), "
        "off (XLA segment_sum fallback), interpret (kernel interpreter, "
        "for CPU debugging). [NEURAL_LAM_TPU_PALLAS]",
    )
    kernels.add_argument(
        "--fused_embed",
        choices=["on", "off"],
        default=None,
        help="Run the static edge-feature embedder INSIDE the fused "
        "kernel (fastest, but cold-compiles in tens of minutes through "
        "the remote helper; amortised by the persistent cache). "
        "[NEURAL_LAM_TPU_FUSED_EMBED]",
    )
    kernels.add_argument(
        "--fused_v2",
        choices=["auto", "off"],
        default=None,
        help="Merged-prologue fused kernel (v2): the banded sender "
        "gather runs inside the edge kernel and the first-layer "
        "node projections hoist outside. off restores the v1 "
        "expand->fused pipeline. Requires --cache_pre on. "
        "[NEURAL_LAM_TPU_FUSED_V2]",
    )
    kernels.add_argument(
        "--cache_pre",
        choices=["on", "off"],
        default=None,
        help="Save the fused kernels' per-edge first-layer "
        "pre-activations as a VJP residual (+3.6%% step time for "
        "~(E x lanes) f32 of HBM per edge set). [NEURAL_LAM_TPU_CACHE_PRE]",
    )
    kernels.add_argument(
        "--bf16_kernels",
        choices=["auto", "off"],
        default=None,
        help="Under --precision bf16, let bf16 streams reach into the "
        "kernels' matmul operands; off keeps kernels f32 with boundary "
        "casts. [NEURAL_LAM_TPU_BF16_KERNELS]",
    )
    kernels.add_argument(
        "--matmul_precision",
        choices=["default", "highest", "high", "high-kernels"],
        default=None,
        help="f32 matmul operand handling. default = the hardware fast "
        "path: on TPU, f32 matmul OPERANDS round to bf16 implicitly "
        "(f32 accumulation) — the TPU counterpart of the reference's "
        "CUDA TF32 default, and what the headline numbers are measured "
        "under. highest = exact f32 operands everywhere (sets "
        "jax_default_matmul_precision, reaching the Pallas kernels "
        "too) for on-TPU parity verification, at multi-pass matmul "
        "cost. high / high-kernels = EXPLICIT bf16 stream/operand "
        "casts (measured slower than default — the rounding already "
        "happens implicitly). [NEURAL_LAM_TPU_MATMUL_PRECISION]",
    )
    kernels.add_argument(
        "--kernel_tiling",
        choices=["default", "sweep"],
        default=None,
        help="Per-edge-set kernel tiling: default = the (256, 512) "
        "tiling tuned for the embed-fused step; sweep = per-set "
        "measured tilings (faster for the non-embed-fused variant). "
        "[NEURAL_LAM_TPU_TILING]",
    )
    kernels.add_argument(
        "--banded_gather",
        choices=["auto", "off"],
        default=None,
        help="Banded sender gather/scatter visit tables; off falls back "
        "to the sender-sorted layout + slot permutation. "
        "[NEURAL_LAM_TPU_BANDED]",
    )
    kernels.add_argument(
        "--aligned_layout",
        choices=["auto", "off"],
        default=None,
        help="Degree-aligned layouts for uniform-degree edge sets "
        "(m2g's 4-NN): the fused kernel replaces its one-hot "
        "gather/aggregate matmuls with static slices. Measured "
        "perf-neutral on v5e (the kernels are stream-bound) with "
        "slightly better numerics under the hardware-default matmul "
        "precision; off (default) keeps the compiled HLO stable. "
        "[NEURAL_LAM_TPU_ALIGNED]",
    )

    arch = parser.add_argument_group("Model Architecture")
    arch.add_argument("--graph", type=str, default="multiscale")
    arch.add_argument("--hidden_dim", type=int, default=64)
    arch.add_argument("--hidden_layers", type=int, default=1)
    arch.add_argument("--processor_layers", type=int, default=4)
    arch.add_argument(
        "--mesh_aggr", type=str, default="sum", choices=["sum", "mean"]
    )
    arch.add_argument("--output_std", action="store_true")
    for flag in (
        "--g2m_gnn_type",
        "--m2g_gnn_type",
        "--mesh_up_gnn_type",
        "--mesh_down_gnn_type",
    ):
        arch.add_argument(
            flag,
            type=str,
            default="InteractionNet",
            choices=["InteractionNet", "PropagationNet"],
        )

    train = parser.add_argument_group("Training Options")
    train.add_argument("--epochs", type=int, default=200)
    train.add_argument("--batch_size", type=int, default=4)
    train.add_argument("--ar_steps_train", type=int, default=1)
    train.add_argument(
        "--loss", type=str, default="wmse", choices=sorted(DEFINED_METRICS)
    )
    train.add_argument("--lr", type=float, default=1e-3)
    train.add_argument(
        "--weight_decay",
        type=float,
        default=0.01,
        help="AdamW decoupled weight decay (default matches the "
        "reference's torch.optim.AdamW default of 0.01, "
        "reference: models/module.py:284-287)",
    )
    train.add_argument("--val_interval", type=int, default=1)

    evalg = parser.add_argument_group("Evaluation Options")
    evalg.add_argument(
        "--eval",
        type=str,
        choices=["val", "test"],
        help="Eval model on given data split instead of training",
    )
    evalg.add_argument("--ar_steps_eval", type=int, default=10)
    evalg.add_argument("--n_example_pred", type=int, default=1)
    evalg.add_argument(
        "--create_gif",
        action="store_true",
        help="Animate example predictions over lead time as GIFs",
    )

    logger = parser.add_argument_group("Logger Settings")
    logger.add_argument(
        "--logger",
        type=str,
        default="csv",
        choices=["csv", "wandb", "mlflow", "none"],
    )
    logger.add_argument("--logger_project", type=str, default="neural_lam")
    logger.add_argument("--logger_run_name", type=str, default=None)
    logger.add_argument(
        "--logger_run_id",
        "--wandb_id",  # drop-in alias for the reference flag name
        dest="logger_run_id",
        type=str,
        default=None,
        help="Resume an existing W&B run by id "
        "(reference --wandb_id, train_model.py:300-306)",
    )
    logger.add_argument("--runs_root", type=str, default="runs")

    metrics = parser.add_argument_group("Metrics & Monitoring")
    metrics.add_argument(
        "--val_steps_to_log",
        type=int,
        nargs="+",
        default=[1, 2, 3, 5, 10],
    )
    metrics.add_argument("--metrics_watch", nargs="+", default=[])
    metrics.add_argument(
        "--var_leads_metrics_watch",
        type=str,
        default="{}",
        help="JSON mapping of variable name -> list of lead steps to "
        'watch, e.g. \'{"t2m": [1, 5]}\'',
    )

    data = parser.add_argument_group("Data Loading & Forcing")
    data.add_argument("--num_past_forcing_steps", type=int, default=1)
    data.add_argument("--num_future_forcing_steps", type=int, default=1)
    data.add_argument(
        "--load_single_member",
        action="store_true",
        help="Only use first ensemble member of ensemble datastores",
    )
    return parser


_KERNEL_FLAG_ENV = {
    "pallas": "NEURAL_LAM_TPU_PALLAS",
    "fused_embed": "NEURAL_LAM_TPU_FUSED_EMBED",
    "fused_v2": "NEURAL_LAM_TPU_FUSED_V2",
    "cache_pre": "NEURAL_LAM_TPU_CACHE_PRE",
    "bf16_kernels": "NEURAL_LAM_TPU_BF16_KERNELS",
    "matmul_precision": "NEURAL_LAM_TPU_MATMUL_PRECISION",
    "kernel_tiling": "NEURAL_LAM_TPU_TILING",
    "banded_gather": "NEURAL_LAM_TPU_BANDED",
    "aligned_layout": "NEURAL_LAM_TPU_ALIGNED",
}


def apply_kernel_flags(args) -> None:
    """Propagate the kernel-tuning CLI flags to their env vars (the ops
    layer reads env at call time). An env var already set in the
    environment wins over the flag — the documented escape hatch."""
    for flag, env in _KERNEL_FLAG_ENV.items():
        value = getattr(args, flag, None)
        if value is not None and env not in os.environ:
            os.environ[env] = value
    # matmul_precision=highest needs a jax config update (before any
    # tracing) to reach XLA and Mosaic dots — see ops.segment
    from .ops.segment import apply_matmul_precision

    apply_matmul_precision()


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    if args.config_path is None:
        raise SystemExit("--config_path is required")
    apply_kernel_flags(args)
    # Validate eval step logging against rollout length. Validation
    # during training also unrolls ar_steps_eval steps, so the check is
    # against ar_steps_eval in both modes
    # (reference: train_model.py:362-407).
    invalid = [s for s in args.val_steps_to_log if s > args.ar_steps_eval]
    if invalid:
        print(
            f"warning: val_steps_to_log {invalid} exceed rollout length "
            f"{args.ar_steps_eval}; they will be skipped",
            file=sys.stderr,
        )

    if args.multihost:
        import jax

        jax.distributed.initialize()

    # Persistent compilation cache (TPU kernel variants compile in
    # minutes through the remote-compile helper; cache once per shape)
    import jax as _jax

    cache_dir = Path(args.runs_root) / ".jax_cache"
    cache_dir.mkdir(parents=True, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    _jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", 1.0
    )

    if args.debug_nans:
        import jax as _jax_dbg

        _jax_dbg.config.update("jax_debug_nans", True)

    utils.seed_everything(args.seed)

    config, datastore = load_config_and_datastore(args.config_path)

    predictor_kwargs = dict(
        graph_name=args.graph,
        hidden_dim=args.hidden_dim,
        hidden_layers=args.hidden_layers,
        processor_layers=args.processor_layers,
        mesh_aggr=args.mesh_aggr,
        num_past_forcing_steps=args.num_past_forcing_steps,
        num_future_forcing_steps=args.num_future_forcing_steps,
        output_std=args.output_std,
        output_clamping_lower=config.training.output_clamping.lower,
        output_clamping_upper=config.training.output_clamping.upper,
        g2m_gnn_type=args.g2m_gnn_type,
        m2g_gnn_type=args.m2g_gnn_type,
        compute_dtype="bfloat16" if args.precision == "bf16" else "float32",
    )
    if args.model != "graph_lam":
        predictor_kwargs.update(
            mesh_up_gnn_type=args.mesh_up_gnn_type,
            mesh_down_gnn_type=args.mesh_down_gnn_type,
        )
    predictor = MODELS[args.model](datastore, **predictor_kwargs)
    forecaster = ARForecaster(predictor, datastore)

    targs = TrainingArgs(
        lr=args.lr,
        weight_decay=args.weight_decay,
        epochs=args.epochs,
        batch_size=args.batch_size,
        ar_steps_train=args.ar_steps_train,
        ar_steps_eval=args.ar_steps_eval,
        loss=args.loss,
        val_interval=args.val_interval,
        val_steps_to_log=tuple(args.val_steps_to_log),
        profile_dir=args.profile_dir,
        precision=args.precision,
        metrics_watch=tuple(args.metrics_watch),
        var_leads_metrics_watch=json.loads(args.var_leads_metrics_watch),
        flat_opt=args.flat_opt,
    )
    import jax

    if args.num_nodes is not None and (
        jax.process_count() != args.num_nodes
    ):
        raise SystemExit(
            f"--num_nodes {args.num_nodes} but jax.distributed "
            f"discovered {jax.process_count()} process(es); check the "
            f"launch configuration"
        )
    mesh = None
    devices = jax.devices()
    if args.devices is not None:
        # per-HOST cap (the Lightning semantic): keep the first N local
        # devices of EVERY process, deterministically on all hosts
        n_local = len(jax.local_devices())
        if args.devices < 1 or args.devices > n_local:
            raise SystemExit(
                f"--devices {args.devices} outside 1..{n_local} "
                f"(local devices per host)"
            )
        by_proc: dict[int, list] = {}
        for d in devices:
            by_proc.setdefault(d.process_index, []).append(d)
        devices = [
            d
            for p in sorted(by_proc)
            for d in by_proc[p][: args.devices]
        ]
    if args.spatial_shards > 1:
        import numpy as _np
        from jax.sharding import Mesh

        if len(devices) % args.spatial_shards:
            raise SystemExit(
                f"--spatial_shards {args.spatial_shards} does not divide "
                f"the device count {len(devices)}"
            )
        data_shards = len(devices) // args.spatial_shards
        mesh = Mesh(
            _np.array(devices).reshape(data_shards, args.spatial_shards),
            axis_names=("data", "spatial"),
        )
    elif args.devices is not None:
        import numpy as _np
        from jax.sharding import Mesh

        if (args.batch_size * jax.process_count()) % len(devices):
            raise SystemExit(
                f"--devices {len(devices)} does not divide the global "
                f"batch size {args.batch_size * jax.process_count()}"
            )
        mesh = Mesh(_np.array(devices), axis_names=("data",))
    trainer = Trainer(forecaster, config, datastore, targs, mesh=mesh)

    params, opt_state = trainer.init_state(jax.random.PRNGKey(args.seed))

    run_name = args.logger_run_name or (
        f"{args.model}-{time.strftime('%m_%d_%H_%M_%S')}"
    )
    run_dir = Path(args.runs_root) / run_name
    run_dir.mkdir(parents=True, exist_ok=True)
    ckpt = CheckpointManager(run_dir)
    hparams = {k: v for k, v in vars(args).items()}
    # Clamping bounds come from the YAML config, not argparse — record
    # them so checkpoints stay fully self-describing (predict/eval
    # rebuilds would otherwise silently construct an UNCLAMPED model;
    # reference self-describing contract: train_model.py:41-72).
    hparams["output_clamping_lower"] = (
        config.training.output_clamping.lower
    )
    hparams["output_clamping_upper"] = (
        config.training.output_clamping.upper
    )

    start_epoch = 0
    if args.load:
        # --load accepts a run dir, its checkpoints/ dir, or a specific
        # checkpoint (…/checkpoints/{latest,min_val_loss}). A run dir
        # itself NAMED "latest" holds its own checkpoints/ subdir.
        load_dir = Path(args.load)
        if load_dir.name in ("latest", "min_val_loss") and not (
            load_dir / "checkpoints"
        ).exists():
            name, root = load_dir.name, load_dir.parent
        else:
            name, root = "latest", load_dir
        if root.name == "checkpoints":
            root = root.parent
        if not (root / "checkpoints" / name).exists():
            raise SystemExit(
                f"--load: no checkpoint {name!r} under "
                f"{root / 'checkpoints'}"
            )
        src = CheckpointManager(root)
        if args.restore_opt:
            params, opt_state, restored_step = src.restore(
                name, params, opt_state
            )
            # Continue epoch numbering where the checkpoint left off
            start_epoch = restored_step + 1
        else:
            params = src.restore_params_only(name, params)
        # Restored trees are host numpy; re-place with the trainer's
        # shardings (params replicated, opt moments ZeRO-1 sharded)
        params, opt_state = trainer.place_state(params, opt_state)
        print(f"loaded checkpoint {name!r} from {src.ckpt_dir}")

    def make_loader(split, ar_steps, shuffle):
        dataset = WeatherDataset(
            datastore,
            split=split,
            ar_steps=ar_steps,
            num_past_forcing_steps=args.num_past_forcing_steps,
            num_future_forcing_steps=args.num_future_forcing_steps,
            load_single_member=args.load_single_member,
        )
        # Multi-host: each process reads a disjoint shard of every epoch
        # (the explicit per-host index scheme replacing the reference's
        # DistributedSampler, SURVEY.md 7).
        return DataLoader(
            dataset,
            batch_size=args.batch_size,
            shuffle=shuffle,
            seed=args.seed,
            prefetch=args.num_workers,
            shard_index=jax.process_index(),
            num_shards=jax.process_count(),
        )

    from .evaluation import run_test_evaluation
    from .loggers import setup_training_logger

    if args.logger_run_id and args.logger != "wandb":
        print(
            f"warning: --logger_run_id is set but logger is "
            f"{args.logger!r}; the run id has no effect "
            "(reference: utils.py:754-757)"
        )
    # Rank-zero-gated logging: only process 0 creates a real logger and
    # writes history files; checkpoint saves stay collective (orbax
    # coordinates across processes). Reference: Lightning rank_zero_only
    # gating of all logger/console output.
    is_rank_zero = jax.process_index() == 0
    if is_rank_zero:
        logger = setup_training_logger(
            args.logger,
            run_dir,
            project=args.logger_project,
            run_name=run_name,
            run_id=args.logger_run_id,
            config=hparams,
        )
    else:
        from .loggers import NullLogger

        logger = NullLogger()
    logger.log_hparams(hparams)
    # Run-level min summaries for the validation losses
    # (reference: neural_lam/utils.py:689-713)
    logger.watch_min_metrics(
        ["val_loss"]
        + [f"val_loss_unroll{s}" for s in args.val_steps_to_log]
    )

    if args.eval:
        if not args.load:
            # reference: train_model.py:382-385
            print(
                "warning: --eval without --load evaluates freshly "
                "initialised parameters; no checkpoint is loaded"
            )
        loader = make_loader(args.eval, args.ar_steps_eval, shuffle=False)
        var_leads = json.loads(args.var_leads_metrics_watch)
        # Validate watched variables against the datastore at CLI time
        # (reference: train_model.py:396-407).
        known_vars = set(datastore.get_vars_names("state"))
        unknown = set(var_leads) - known_vars
        if unknown:
            raise SystemExit(
                f"--var_leads_metrics_watch names unknown state "
                f"variables: {sorted(unknown)}"
            )
        metrics = run_test_evaluation(
            trainer,
            params,
            loader,
            datastore,
            run_dir,
            logger=logger,
            split=args.eval,
            n_example_pred=args.n_example_pred,
            create_gif=args.create_gif,
            metrics_watch=args.metrics_watch,
            var_leads_metrics_watch=var_leads,
        )
        print(json.dumps(metrics, indent=2))
        logger.finish()
        return

    # Validation unrolls ar_steps_eval steps, like the reference DataModule
    # (reference: weather_dataset.py:710-726).
    train_loader = make_loader("train", args.ar_steps_train, shuffle=True)
    val_loader = make_loader("val", args.ar_steps_eval, shuffle=False)

    history_path = run_dir / "history.jsonl"

    step_counter = {"epoch": 0}

    def log_fn(record):
        step_counter["epoch"] = record["epoch"]
        if is_rank_zero:
            with open(history_path, "a", encoding="utf-8") as f:
                f.write(json.dumps(record) + "\n")
            print(json.dumps(record))
            logger.log_metrics(record, step=record["epoch"])
        ckpt.save_latest(
            log_fn.params, log_fn.opt_state, record["epoch"], hparams
        )
        if "val_loss" in record:
            ckpt.maybe_save_best(
                record["val_loss"],
                log_fn.params,
                log_fn.opt_state,
                record["epoch"],
                hparams,
            )

    # Preemption-signal rescue (SURVEY.md 5.3): a SIGTERM from the
    # scheduler / TPU maintenance event drains the current epoch and
    # writes the latest checkpoint below before the process exits.
    trainer.install_preemption_handler()

    # Run epoch-by-epoch so checkpoints always see the current state
    for epoch in range(start_epoch, args.epochs):
        params, opt_state, history = trainer.fit(
            params,
            opt_state,
            train_loader,
            val_loader if (epoch + 1) % args.val_interval == 0 else None,
            epochs=1,
            start_epoch=epoch,
        )
        record = dict(history[0])
        record["epoch"] = epoch
        log_fn.params, log_fn.opt_state = params, opt_state
        log_fn(record)
        if trainer.preempt_event.is_set():
            print(
                "preemption signal received: latest checkpoint saved, "
                "exiting (resume with --load <run_dir> --restore_opt)"
            )
            break
    logger.finish()


if __name__ == "__main__":
    main()
