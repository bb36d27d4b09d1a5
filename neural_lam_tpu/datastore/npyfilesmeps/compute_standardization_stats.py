"""Compute MEPS standardization statistics (two streaming passes).

Counterpart of the reference script
(reference: neural_lam/datastore/npyfilesmeps/compute_standardization_stats.py:215-465):
pass 1 accumulates per-variable mean/std of the state (and flux forcing)
over the train split; pass 2 computes mean/std of the *standardized*
one-step state differences. The reference optionally shards the passes
over a torch.distributed NCCL/Gloo group; here a single host streams
the memory-mapped files (one analysis time in memory at a time), which
covers the same datasets without a cluster. Results are written as
``.npy`` files in ``static/`` (the store also reads the legacy ``.pt``
names).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from .store import NpyFilesDatastoreMEPS


class _RunningMoments:
    """Streaming per-feature mean/std over (…, feature) arrays."""

    def __init__(self, n_features: int) -> None:
        self.count = 0
        self.sum = np.zeros(n_features, dtype=np.float64)
        self.sumsq = np.zeros(n_features, dtype=np.float64)

    def update(self, arr: np.ndarray) -> None:
        flat = arr.reshape(-1, arr.shape[-1]).astype(np.float64)
        self.count += flat.shape[0]
        self.sum += flat.sum(axis=0)
        self.sumsq += (flat * flat).sum(axis=0)

    def finalize(self) -> tuple[np.ndarray, np.ndarray]:
        mean = self.sum / self.count
        var = np.maximum(self.sumsq / self.count - mean * mean, 0.0)
        return mean.astype(np.float32), np.sqrt(var).astype(np.float32)


def compute_stats(
    datastore: NpyFilesDatastoreMEPS,
    subsample_step: int = 1,
    num_workers: int = 1,
) -> dict[str, np.ndarray]:
    """Return all stats arrays for the train split.

    ``subsample_step`` matches the reference's diff subsampling: one-step
    differences are taken between states ``subsample_step`` file-steps
    apart (the effective model step, reference: c_s_s.py:363-465).
    ``num_workers > 1`` parallelises the per-analysis-time reads with a
    thread pool — the single-host replacement for the reference's
    torch.distributed multi-node pass (reference: c_s_s.py:92-139).
    """
    from concurrent.futures import ThreadPoolExecutor

    da_state = datastore.get_dataarray(category="state", split="train")
    da_forcing = datastore.get_dataarray(category="forcing", split="train")

    n_state = datastore.get_num_data_vars("state")
    n_analysis = da_state.shape[0]

    def load_pair(i):
        return (
            np.asarray(da_state.data[i]),
            np.asarray(da_forcing.data[i]),
        )

    state_mom = _RunningMoments(n_state)
    flux_mom = _RunningMoments(1)
    with ThreadPoolExecutor(max_workers=max(num_workers, 1)) as pool:
        for state, forcing in pool.map(load_pair, range(n_analysis)):
            state_mom.update(state)  # (T[, M], grid, d)
            flux_mom.update(forcing[..., :1])
    state_mean, state_std = state_mom.finalize()
    flux_mean, flux_std = flux_mom.finalize()

    diff_mom = _RunningMoments(n_state)
    with ThreadPoolExecutor(max_workers=max(num_workers, 1)) as pool:
        for state in pool.map(
            lambda i: np.asarray(da_state.data[i]), range(n_analysis)
        ):
            standardized = (state - state_mean) / state_std
            sub = (
                standardized[::subsample_step]
                if subsample_step > 1
                else standardized
            )
            diffs = np.diff(sub, axis=0)
            diff_mom.update(diffs)
    diff_mean, diff_std = diff_mom.finalize()

    return {
        "parameter_mean": state_mean,
        "parameter_std": state_std,
        "diff_mean": diff_mean,
        "diff_std": diff_std,
        "flux_stats": np.array([flux_mean[0], flux_std[0]], np.float32),
    }


def save_stats(static_dir: Path, stats: dict[str, np.ndarray]) -> None:
    static_dir.mkdir(parents=True, exist_ok=True)
    for name, arr in stats.items():
        np.save(static_dir / f"{name}.npy", arr)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="Compute standardization stats for a MEPS npy datastore"
    )
    parser.add_argument(
        "--datastore_config_path",
        type=str,
        required=True,
        help="Path to the datastore config (data_config.yaml)",
    )
    parser.add_argument("--subsample_step", type=int, default=1)
    parser.add_argument("--num_workers", type=int, default=4)
    args = parser.parse_args(argv)

    datastore = NpyFilesDatastoreMEPS(config_path=args.datastore_config_path)
    stats = compute_stats(
        datastore,
        subsample_step=args.subsample_step,
        num_workers=args.num_workers,
    )
    save_stats(datastore.root_path / "static", stats)
    for name, arr in stats.items():
        print(f"{name}: shape {arr.shape}")


if __name__ == "__main__":
    main()
