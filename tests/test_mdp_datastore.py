"""MDP zarr datastore + minizarr reader on a synthetic store.

Writes a zarr v2 directory by hand (JSON metadata + zlib chunks, the
format xarray/mllam-data-prep produce) and reads it back through
``MDPDatastore`` (reference: neural_lam/datastore/mdp.py:25-420).
"""

import json
import zlib
from datetime import timedelta

import numpy as np
import pytest
import yaml

from neural_lam_tpu.dataset import WeatherDataset
from neural_lam_tpu.datastore.mdp import MDPDatastore

NX, NY = 8, 9
N_GRID = NX * NY
T = 20
N_STATE, N_FORCING, N_STATIC = 3, 2, 1


def _write_array(
    root, name, values, dims, attrs=None, chunks=None, compress=True
):
    values = np.ascontiguousarray(values)
    adir = root / name
    adir.mkdir(parents=True)
    chunks = list(chunks or values.shape) or [1]
    meta = {
        "zarr_format": 2,
        "shape": list(values.shape),
        "chunks": chunks if values.shape else [1],
        "dtype": values.dtype.str,
        "compressor": {"id": "zlib", "level": 1} if compress else None,
        "fill_value": None,
        "filters": None,
        "order": "C",
    }
    (adir / ".zarray").write_text(json.dumps(meta), encoding="utf-8")
    all_attrs = {"_ARRAY_DIMENSIONS": list(dims)}
    all_attrs.update(attrs or {})
    (adir / ".zattrs").write_text(json.dumps(all_attrs), encoding="utf-8")

    n_chunks = [
        -(-s // c) for s, c in zip(values.shape, meta["chunks"])
    ] or [1]
    for idx in np.ndindex(*n_chunks):
        if values.shape:
            slices = tuple(
                slice(i * c, (i + 1) * c)
                for i, c in zip(idx, meta["chunks"])
            )
            chunk = values[slices]
            # pad partial chunks to full chunk shape
            pad = [
                (0, c - s)
                for c, s in zip(meta["chunks"], chunk.shape)
            ]
            chunk = np.pad(chunk, pad)
            key = ".".join(str(i) for i in idx)
        else:
            chunk = values
            key = "0"
        raw = chunk.tobytes()
        (adir / key).write_bytes(
            zlib.compress(raw, 1) if compress else raw
        )


@pytest.fixture(scope="module")
def mdp_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mdp")
    zarr_dir = root / "danra.datastore.zarr"
    zarr_dir.mkdir()
    (zarr_dir / ".zgroup").write_text('{"zarr_format": 2}')

    rng = np.random.default_rng(0)
    # y-major stacking (grid_index = y * NX + x), the mllam default
    xs = np.tile(1000.0 * np.arange(NX), NY)
    ys = np.repeat(2000.0 * np.arange(NY), NX)
    hours = np.arange(T) * 3
    state = rng.normal(size=(T, N_GRID, N_STATE)).astype(np.float32)
    forcing = rng.normal(size=(T, N_GRID, N_FORCING)).astype(np.float32)
    static = rng.normal(size=(N_GRID, N_STATIC)).astype(np.float32)

    _write_array(
        zarr_dir, "time", hours.astype("int64"),
        ["time"], attrs={"units": "hours since 1990-09-01 00:00:00"},
    )
    _write_array(zarr_dir, "x", xs, ["grid_index"])
    _write_array(zarr_dir, "y", ys, ["grid_index"])
    _write_array(
        zarr_dir, "state", state,
        ["time", "grid_index", "state_feature"],
        chunks=[7, N_GRID, N_STATE],
    )
    _write_array(
        zarr_dir, "forcing", forcing,
        ["time", "grid_index", "forcing_feature"],
    )
    _write_array(
        zarr_dir, "static", static, ["grid_index", "static_feature"]
    )
    for cat, n in (
        ("state", N_STATE), ("forcing", N_FORCING), ("static", N_STATIC)
    ):
        names = np.array([f"{cat}{i}" for i in range(n)], dtype="<U10")
        _write_array(
            zarr_dir, f"{cat}_feature", names, [f"{cat}_feature"]
        )
        _write_array(
            zarr_dir, f"{cat}_feature_units",
            np.array(["unit"] * n, dtype="<U6"), [f"{cat}_feature"],
        )
        _write_array(
            zarr_dir, f"{cat}_feature_long_name",
            np.array([f"{cat} var {i}" for i in range(n)], dtype="<U20"),
            [f"{cat}_feature"],
        )
    # splits: train = first 12 steps, val next 4, test last 4
    split_times = np.array(
        [[hours[0], hours[11]], [hours[12], hours[15]],
         [hours[16], hours[19]]],
        dtype="int64",
    )
    _write_array(
        zarr_dir, "splits", split_times,
        ["split_name", "split_part"],
        attrs={"units": "hours since 1990-09-01 00:00:00"},
    )
    _write_array(
        zarr_dir, "splits_split_name",
        np.array(["train", "val", "test"], dtype="<U5"), ["split_name"],
    )
    _write_array(
        zarr_dir, "splits_split_part",
        np.array(["start", "end"], dtype="<U5"), ["split_part"],
    )
    for cat, vals in (("state", state), ("forcing", forcing),
                      ("static", static[None])):
        mean = vals.reshape(-1, vals.shape[-1]).mean(0)
        std = vals.reshape(-1, vals.shape[-1]).std(0)
        _write_array(
            zarr_dir, f"{cat}__train__mean", mean, [f"{cat}_feature"]
        )
        _write_array(
            zarr_dir, f"{cat}__train__std", std, [f"{cat}_feature"]
        )
    diffs = np.diff(state, axis=0).reshape(-1, N_STATE)
    _write_array(
        zarr_dir, "state__train__diff_mean", diffs.mean(0),
        ["state_feature"],
    )
    _write_array(
        zarr_dir, "state__train__diff_std", diffs.std(0),
        ["state_feature"],
    )

    config = {
        "schema_version": "v0.5.0",
        "extra": {
            "projection": {
                "class_name": "LambertConformal",
                "kwargs": {"central_longitude": 25.0},
            }
        },
    }
    (root / "danra.datastore.yaml").write_text(
        yaml.safe_dump(config), encoding="utf-8"
    )
    return root


@pytest.fixture(scope="module")
def store(mdp_root):
    return MDPDatastore(
        config_path=mdp_root / "danra.datastore.yaml", n_boundary_points=2
    )


def test_metadata(store):
    assert not store.is_forecast and not store.is_ensemble
    assert store.num_grid_points == N_GRID
    assert store.grid_shape_state.x == NX
    assert store.grid_shape_state.y == NY
    assert store.step_length == timedelta(hours=3)
    assert store.get_vars_names("state") == ["state0", "state1", "state2"]
    assert store.get_vars_long_names("forcing") == [
        "forcing var 0", "forcing var 1",
    ]


def test_split_selection(store):
    da_train = store.get_dataarray("state", split="train")
    da_val = store.get_dataarray("state", split="val")
    da_test = store.get_dataarray("state", split="test")
    assert da_train.shape == (12, N_GRID, N_STATE)
    assert da_val.shape == (4, N_GRID, N_STATE)
    assert da_test.shape == (4, N_GRID, N_STATE)
    assert da_train.dims == ("time", "grid_index", "state_feature")


def test_standardization_stats(store):
    stats = store.get_standardization_dataarray("state")
    assert stats["state_mean"].shape == (N_STATE,)
    # diff stats must be standardized by state std
    assert "state_diff_std_standardized" in stats
    da = store.get_dataarray("state", split="train", standardize=True)
    vals = np.asarray(da.data)
    assert abs(vals.mean()) < 0.1 and abs(vals.std() - 1) < 0.1


def test_boundary_mask_and_xy(store):
    mask = np.asarray(store.boundary_mask.data)
    assert mask.shape == (N_GRID,)
    # 2-point frame on an 8x9 grid: interior (8-4)*(9-4)=20 zeros
    assert int((mask == 0).sum()) == (NX - 4) * (NY - 4)
    xy = store.get_xy("state", stacked=True)
    assert xy.shape == (N_GRID, 2)
    unstacked = store.get_xy("state", stacked=False)
    assert unstacked.shape == (NX, NY, 2)
    # consistency: stacking the unstacked x field reproduces stacked x
    np.testing.assert_allclose(
        store.stack_grid_coords(unstacked[..., 0]), xy[:, 0]
    )


def test_weather_dataset_on_mdp(store):
    dataset = WeatherDataset(store, split="train", ar_steps=2)
    # window = max(2,1)+2+1 = 5 -> 12-5+1 = 8 samples
    assert len(dataset) == 8
    init, target, forcing, times = dataset[0]
    assert init.shape == (2, N_GRID, N_STATE)
    assert target.shape == (2, N_GRID, N_STATE)
    assert forcing.shape == (2, N_GRID, N_FORCING * 3)


def _shuffle_bytes(block: bytes, typesize: int) -> bytes:
    """c-blosc per-block byte shuffle: planes of first/second/... bytes,
    tail bytes not filling a whole element copied through verbatim."""
    n = len(block) // typesize
    body = n * typesize
    return (
        np.frombuffer(block[:body], np.uint8).reshape(n, typesize).T.tobytes()
        + block[body:]
    )


def _make_blosc_frame(data: bytes, typesize=4, codec_id=4, shuffle=False,
                      memcpy=False, blocksize=None):
    """Construct a blosc1 frame per the decoder's documented layout.

    ``blocksize`` < len(data) produces a multi-block frame; the shuffle
    filter is applied per block, exactly as c-blosc does.

    NOTE: validates our decoder's self-consistency; real-world blosc
    compatibility is exercised only when reading actual blosc stores.
    """
    import struct
    import zstandard

    flags = (0x1 if shuffle else 0) | (0x2 if memcpy else 0) | (
        codec_id << 5
    )
    if memcpy:
        header = struct.pack(
            "<BBBBIII", 2, 1, flags, typesize, len(data),
            len(data), len(data) + 16,
        )
        return header + data
    if blocksize is None:
        blocksize = len(data)
    nblocks = -(-len(data) // blocksize)
    streams = []
    for b in range(nblocks):
        block = data[b * blocksize : (b + 1) * blocksize]
        if shuffle:
            block = _shuffle_bytes(block, typesize)
        comp = zstandard.ZstdCompressor().compress(block)
        streams.append(struct.pack("<i", len(comp)) + comp)
    table_end = 16 + 4 * nblocks
    bstarts, pos = [], table_end
    for s in streams:
        bstarts.append(pos)
        pos += len(s)
    header = struct.pack(
        "<BBBBIII", 2, 1, flags, typesize, len(data), blocksize, pos,
    )
    table = struct.pack(f"<{nblocks}i", *bstarts)
    return header + table + b"".join(streams)


@pytest.mark.parametrize("shuffle", [False, True])
def test_blosc_zstd_chunk_decoding(shuffle):
    from neural_lam_tpu.utils.minizarr import _blosc_decompress

    rng = np.random.default_rng(7)
    data = rng.normal(size=256).astype(np.float32).tobytes()
    frame = _make_blosc_frame(data, typesize=4, shuffle=shuffle)
    assert _blosc_decompress(frame) == data


@pytest.mark.parametrize("tail", [0, 3])
def test_blosc_multiblock_shuffled_decoding(tail):
    """Shuffled frames with nbytes > blocksize must unshuffle per block
    (regression: a single frame-wide unshuffle scrambles every multi-
    block chunk while keeping the length correct)."""
    from neural_lam_tpu.utils.minizarr import _blosc_decompress

    rng = np.random.default_rng(11)
    data = rng.normal(size=300).astype(np.float32).tobytes()
    if tail:
        data += bytes(range(tail))  # last element split across blocks
    frame = _make_blosc_frame(data, typesize=4, shuffle=True, blocksize=512)
    assert len(data) > 512  # really multi-block
    assert _blosc_decompress(frame) == data


def test_blosc_memcpy_chunk_decoding():
    from neural_lam_tpu.utils.minizarr import _blosc_decompress

    data = bytes(range(256)) * 4
    frame = _make_blosc_frame(data, memcpy=True)
    assert _blosc_decompress(frame) == data


def test_missing_zarr_without_mdp_package(tmp_path):
    """Without mllam-data-prep installed, a missing zarr raises an
    actionable error naming both remediation paths (the reference
    creates the dataset on demand, reference: mdp.py:77-92)."""
    cfg = tmp_path / "absent.datastore.yaml"
    cfg.write_text("schema_version: v0.5.0\n", encoding="utf-8")
    from neural_lam_tpu.datastore.mdp import MDPDatastore

    with pytest.raises(FileNotFoundError, match="mllam-data-prep"):
        MDPDatastore(cfg)


def test_missing_units_array_yields_placeholders(mdp_root, tmp_path):
    """A zarr with 'forcing_feature' but no 'forcing_feature_units'
    (mllam configs without units metadata) must keep names/units zips
    aligned via placeholders — not claim 'no forcing data found'."""
    import shutil
    import warnings as _warnings

    root = tmp_path / "mdp_nounits"
    shutil.copytree(mdp_root, root)
    shutil.rmtree(
        root / "danra.datastore.zarr" / "forcing_feature_units"
    )
    store = MDPDatastore(
        config_path=root / "danra.datastore.yaml", n_boundary_points=2
    )
    names = store.get_vars_names("forcing")
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        units = store.get_vars_units("forcing")
    assert units == ["unknown"] * len(names)
    assert any("placeholder" in str(x.message) for x in w)
    # the category itself is intact
    assert store.get_num_data_vars("forcing") == N_FORCING


def test_graph_grid_indices_match_y_major_stacking(store, tmp_path):
    """g2m/m2g edges must index grid nodes in the DATASTORE's
    grid_index order. This store stacks y-major (grid_index =
    y * Nx + x, the mllam default); an x-major flatten in the graph
    builder would connect spatially wrong grid points (silently —
    shapes all match)."""
    import scipy.spatial

    from neural_lam_tpu.graphs import create_graph_from_datastore

    out = tmp_path / "graph" / "ymajor"
    create_graph_from_datastore(store, out, hierarchical=False)

    grid_pos = store.get_xy("state", stacked=True)  # grid_index order
    import numpy as _np

    raw = _np.load(out / "graph.npz")
    mesh_pos = raw["mesh_features__0"]

    # m2g: every grid node receives from its 4 nearest mesh nodes
    # (reference: create_graph.py:779-792)
    kdt = scipy.spatial.KDTree(mesh_pos)
    senders, receivers = raw["m2g_senders"], raw["m2g_receivers"]
    for gidx in range(0, grid_pos.shape[0], 7):
        got = sorted(senders[receivers == gidx])
        want = sorted(kdt.query(grid_pos[gidx], k=4)[1])
        assert got == want, (
            f"grid node {gidx}: m2g senders {got} != 4-NN {want} — "
            "grid flatten order does not match the store's stacking"
        )


def test_blosc_raw_block_marker():
    """c-blosc1 stores incompressible blocks RAW with csize == neblock
    (a POSITIVE marker, not only negative csize); the decoder must
    memcpy them instead of feeding raw bytes to the codec."""
    import struct

    from neural_lam_tpu.utils.minizarr import _blosc_decompress

    rng = np.random.default_rng(11)
    data = rng.integers(0, 256, size=512, dtype=np.uint8).tobytes()
    # single raw block frame: stream = int32(len) + raw bytes
    flags = 4 << 5  # zstd codec id, no shuffle/memcpy flags
    stream = struct.pack("<i", len(data)) + data
    header = struct.pack(
        "<BBBBIII", 2, 1, flags, 1, len(data), len(data),
        16 + 4 + len(stream),
    )
    table = struct.pack("<i", 20)
    frame = header + table + stream
    out = _blosc_decompress(frame)
    assert out == data
