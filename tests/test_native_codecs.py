"""Native codec extension: builds, matches the python fallbacks.

Exercises the C fast path of the zarr reader (the counterpart of the
numcodecs/blosc native wheels the reference relies on via xarray).
"""

import numpy as np
import pytest

from neural_lam_tpu.native import get_fastcodec
from neural_lam_tpu.utils.minizarr import _lz4_decompress_block_py


@pytest.fixture(scope="module")
def fastcodec():
    mod = get_fastcodec()
    if mod is None:
        from neural_lam_tpu.native.build import build

        build()
        import neural_lam_tpu.native as native

        native._tried = False
        mod = get_fastcodec()
    assert mod is not None, "could not build the native extension"
    return mod


def _lz4_compress_naive(data: bytes) -> bytes:
    """Minimal valid LZ4 block: all-literal sequences.

    Produces a correct (if uncompressed) stream so both decoders can be
    cross-checked on arbitrary payloads without an lz4 library.
    """
    out = bytearray()
    lit = len(data)
    token_lit = min(lit, 15)
    out.append(token_lit << 4)
    if token_lit == 15:
        rest = lit - 15
        while rest >= 255:
            out.append(255)
            rest -= 255
        out.append(rest)
    out += data
    return bytes(out)


def test_lz4_literal_stream_roundtrip(fastcodec):
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 10000, dtype=np.uint8).tobytes()
    src = _lz4_compress_naive(data)
    assert fastcodec.lz4_decompress(src, len(data)) == data
    assert _lz4_decompress_block_py(src, len(data)) == data


def test_lz4_with_matches(fastcodec):
    # token: 5 literals + match len 4+3; offset 5 -> repeats "abcde"
    src = bytes([0x53]) + b"abcde" + bytes([0x05, 0x00])
    want = b"abcdeabcdeab"
    assert fastcodec.lz4_decompress(src, 12) == want
    assert _lz4_decompress_block_py(src, 12) == want


def test_lz4_overlapping_match(fastcodec):
    # 1 literal "x", match offset 1 len 8 -> RLE "xxxxxxxxx"
    src = bytes([0x14]) + b"x" + bytes([0x01, 0x00])
    want = b"x" * 9
    assert fastcodec.lz4_decompress(src, 9) == want
    assert _lz4_decompress_block_py(src, 9) == want


def test_lz4_corrupt_raises(fastcodec):
    with pytest.raises(ValueError):
        fastcodec.lz4_decompress(bytes([0x10]), 4)  # missing literal


def test_byte_unshuffle_matches_numpy(fastcodec):
    rng = np.random.default_rng(1)
    for typesize in (2, 4, 8):
        data = rng.integers(
            0, 256, 96 * typesize, dtype=np.uint8
        ).tobytes()
        n = len(data) // typesize
        shuffled = (
            np.frombuffer(data, np.uint8)
            .reshape(n, typesize)
            .T.tobytes()
        )
        got = fastcodec.byte_unshuffle(shuffled, typesize)
        assert got == data
