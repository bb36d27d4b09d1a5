"""Dataset/datastore integration: shapes, loader batching, standardization."""

import numpy as np
import pytest

from neural_lam_tpu.datastore.dummy import DummyDatastore
from neural_lam_tpu.dataset import WeatherDataset
from neural_lam_tpu.loader import DataLoader


def test_dummy_datastore_sample_shapes():
    ds = DummyDatastore(n_grid_x=6, n_grid_y=5, n_timesteps=12)
    dataset = WeatherDataset(ds, split="train", ar_steps=3)
    init_states, target_states, forcing, target_times = dataset[0]
    n_grid = 30
    assert init_states.shape == (2, n_grid, 3)
    assert target_states.shape == (3, n_grid, 3)
    assert forcing.shape == (3, n_grid, 2 * 3)  # 2 forcing vars, window 3
    assert target_times.shape == (3,)
    assert target_times.dtype == np.int64


def test_dummy_datastore_boundary_mask():
    ds = DummyDatastore(n_grid_x=8, n_grid_y=8, n_boundary=2)
    mask = ds.boundary_mask.values.reshape(8, 8)
    assert mask[0, 0] == 1 and mask[1, 1] == 1
    assert mask[4, 4] == 0
    # frame width 2 on an 8x8 grid: interior is 4x4
    assert mask.sum() == 64 - 16


def test_dataloader_batching_and_shuffle():
    ds = DummyDatastore(n_grid_x=4, n_grid_y=4, n_timesteps=20)
    dataset = WeatherDataset(ds, split="train", ar_steps=1)
    loader = DataLoader(dataset, batch_size=4, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == len(loader)
    init, target, forcing, times = batches[0]
    assert init.shape == (4, 2, 16, 3)
    assert target.shape == (4, 1, 16, 3)

    # deterministic given epoch
    loader.set_epoch(0)
    again = list(loader)
    np.testing.assert_array_equal(batches[0][0], again[0][0])
    # different epoch order differs
    loader.set_epoch(1)
    other = list(loader)
    assert not np.array_equal(batches[0][0], other[0][0])


def test_dataloader_sharding_partitions_samples():
    ds = DummyDatastore(n_grid_x=4, n_grid_y=4, n_timesteps=20)
    dataset = WeatherDataset(ds, split="train", ar_steps=1)
    all_times = set()
    n_total = 0
    for shard in range(2):
        loader = DataLoader(
            dataset,
            batch_size=2,
            shuffle=False,
            drop_last=False,
            shard_index=shard,
            num_shards=2,
        )
        for batch in loader:
            for t in batch[3][:, 0]:
                all_times.add(int(t))
                n_total += 1
    # Shards are padded (wrapping) to equal length so every host runs
    # the same number of steps; coverage is complete, duplicates are
    # exactly the lockstep pad.
    pad = (-len(dataset)) % 2
    assert n_total == len(dataset) + pad
    assert len(all_times) == len(dataset)


def test_standardize_flag():
    ds = DummyDatastore(computed_stats=True)
    da_raw = ds.get_dataarray("state", "train", standardize=False)
    da_std = ds.get_dataarray("state", "train", standardize=True)
    stats = ds.get_standardization_dataarray("state")
    want = (da_raw.values - stats["state_mean"]) / stats["state_std"]
    np.testing.assert_allclose(da_std.values, want, rtol=1e-6)
    # standardized data ~ zero mean unit std
    assert abs(da_std.values.mean()) < 0.1


def test_ensemble_analysis_datastore_exact_values(tmp_path):
    """Ensemble members expose as independent samples, time-major
    (reference: tests/test_datasets.py:383-453 with the deterministic
    EnsembleDummyDatastore values)."""
    from neural_lam_tpu.datastore.dummy import EnsembleDummyDatastore

    ds = EnsembleDummyDatastore(
        n_members=3, n_grid_x=4, n_grid_y=4, n_timesteps=10,
        root_path=tmp_path,
    )
    dataset = WeatherDataset(ds, split="train", ar_steps=2)
    base_len = 10 - (2 + 2 + 1) + 1
    assert len(dataset) == base_len * 3

    # idx -> (sample divmod members): idx 4 -> sample 1, member 1
    init, target, forcing, _ = dataset[4]
    # sample 1 -> times [1,2] init, [3,4] targets; member 1
    np.testing.assert_allclose(init[:, 0, 0], [1 * 100 + 1, 2 * 100 + 1])
    np.testing.assert_allclose(
        target[:, 0, 0], [3 * 100 + 1, 4 * 100 + 1]
    )

    # load_single_member uses only member 0
    with pytest.warns(UserWarning):
        single = WeatherDataset(
            ds, split="train", ar_steps=2, load_single_member=True
        )
    assert len(single) == base_len
    init_s, _, _, _ = single[1]
    np.testing.assert_allclose(init_s[:, 0, 0], [100, 200])


def test_weather_data_module(tmp_path):
    """DataModule bundle (reference: weather_dataset.py:641-772)."""
    from neural_lam_tpu.loader import WeatherDataModule

    ds = DummyDatastore(
        n_grid_x=5, n_grid_y=5, n_timesteps=16, root_path=tmp_path
    )
    dm = WeatherDataModule(
        ds, ar_steps_train=1, ar_steps_eval=3, batch_size=2
    )
    train_batch = next(iter(dm.train_dataloader()))
    assert train_batch[1].shape[1] == 1  # ar_steps_train
    val_batch = next(iter(dm.val_dataloader()))
    assert val_batch[1].shape[1] == 3  # ar_steps_eval
    test_batch = next(iter(dm.test_dataloader()))
    assert test_batch[0].shape == (2, 2, 25, 3)


def test_loader_shard_disjointness(tmp_path):
    """Per-host shards cover the epoch completely, run in lockstep
    (identical per-shard lengths), and only the wrap-pad duplicates."""
    ds = DummyDatastore(
        n_grid_x=4, n_grid_y=4, n_timesteps=20, root_path=tmp_path
    )
    dataset = WeatherDataset(ds, split="train", ar_steps=1)
    shards = [
        DataLoader(
            dataset, batch_size=2, shuffle=True, seed=3,
            shard_index=i, num_shards=3, drop_last=False,
        )
        for i in range(3)
    ]
    per_shard = []
    for loader in shards:
        loader.set_epoch(5)
        per_shard.append(loader._epoch_indices().tolist())
    assert len({len(p) for p in per_shard}) == 1  # lockstep lengths
    seen = [i for p in per_shard for i in p]
    assert set(seen) == set(range(len(dataset)))  # full coverage
    pad = (-len(dataset)) % 3
    assert len(seen) == len(dataset) + pad  # only the wrap-pad repeats


def test_dataloader_pad_exceeds_dataset_size():
    """When there are fewer samples than shards the wrap-pad must cycle
    the dataset as many times as needed — every shard still sees the
    same number of indices (the multi-host lockstep requirement)."""
    ds = DummyDatastore(n_grid_x=4, n_grid_y=4, n_timesteps=6)
    dataset = WeatherDataset(ds, split="train", ar_steps=1)
    n = len(dataset)
    num_shards = n + 6  # force pad > n
    lengths = set()
    seen = []
    for i in range(num_shards):
        loader = DataLoader(
            dataset, batch_size=1, shuffle=False, drop_last=False,
            shard_index=i, num_shards=num_shards,
        )
        idxs = loader._epoch_indices()
        lengths.add(len(idxs))
        seen.extend(idxs.tolist())
    assert lengths == {1}
    assert set(seen) == set(range(n))  # coverage despite wrapping


def test_dataloader_abandoned_iteration_stops_producer():
    """Abandoning iteration mid-epoch must not strand the prefetch
    thread blocked on a full queue."""
    import threading
    import time

    ds = DummyDatastore(n_grid_x=4, n_grid_y=4, n_timesteps=40)
    dataset = WeatherDataset(ds, split="train", ar_steps=1)
    before = threading.active_count()
    loader = DataLoader(dataset, batch_size=1, prefetch=1)
    it = iter(loader)
    next(it)  # producer now blocked on a full queue
    it.close()  # abandon mid-epoch (GeneratorExit)
    deadline = time.monotonic() + 5.0
    while threading.active_count() > before and time.monotonic() < deadline:
        time.sleep(0.01)
    assert threading.active_count() == before


def test_ensemble_computed_stats_are_per_feature():
    """Computed stats over a 4-d (T, member, grid, feat) ensemble store
    must reduce to per-feature vectors, not (grid, feat) matrices."""
    from neural_lam_tpu.datastore.dummy import EnsembleDummyDatastore

    ds = EnsembleDummyDatastore(
        n_grid_x=3, n_grid_y=3, n_timesteps=8, computed_stats=True
    )
    stats = ds.get_standardization_dataarray(category="state")
    n_feat = ds.get_num_data_vars("state")
    for key in (
        "state_mean",
        "state_std",
        "state_diff_mean_standardized",
        "state_diff_std_standardized",
    ):
        assert stats[key].shape == (n_feat,), (key, stats[key].shape)
