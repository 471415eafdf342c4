"""M1 tests: decode anything the reference library encodes, bit-exact."""
import numpy as np
import pytest

from lerc_tpu.codec.orchestrator import decode_blob, get_lerc_info

from . import oracle

pytestmark = pytest.mark.skipif(not oracle.available(), reason="reference lib not built")

RNG = np.random.default_rng(42)

DTYPES = [np.int8, np.uint8, np.int16, np.uint16, np.int32, np.uint32, np.float32, np.float64]


def make_data(dtype, n_bands, n_rows, n_cols, n_depth, kind="smooth"):
    shape = (n_bands, n_rows, n_cols, n_depth)
    x = np.linspace(0, 6, n_cols)[None, None, :, None]
    y = np.linspace(0, 4, n_rows)[None, :, None, None]
    b = np.arange(n_bands)[:, None, None, None].astype(np.float64)
    d = np.arange(n_depth)[None, None, None, :].astype(np.float64)
    if kind == "smooth":
        base = 100 * np.sin(x + b) * np.cos(y - d) + 20 * x * y
    elif kind == "noisy":
        base = RNG.normal(0, 50, shape)
    elif kind == "const":
        base = np.full(shape, 7.0)
    elif kind == "segmented":
        base = (np.floor(x * 2) + np.floor(y * 3) + b + d) * 10
    else:
        raise ValueError(kind)
    if np.issubdtype(dtype, np.integer):
        info = np.iinfo(dtype)
        return np.clip(np.round(base), max(info.min, -1000), min(info.max, 1000)).astype(dtype)
    return base.astype(dtype)


def roundtrip_vs_oracle(data, masks, max_z_err, version=-1, uses_nodata=None, nodata=None):
    n_bands, n_rows, n_cols, n_depth = data.shape
    blob = oracle.encode(
        data, n_depth, n_cols, n_rows, n_bands, masks, max_z_err,
        version=version, uses_nodata=uses_nodata, nodata=nodata,
    )
    ref_data, ref_masks, ref_un, ref_nd = oracle.decode(blob)
    res = decode_blob(blob)
    assert res.data.shape == ref_data.shape
    assert np.array_equal(res.data, ref_data), "decoded pixels differ from reference"
    if ref_masks is not None:
        m = ref_masks.astype(bool)
        assert np.array_equal(res.masks[: m.shape[0]], m)
    else:
        assert res.masks.all()
    assert np.array_equal(res.uses_no_data.astype(np.uint8), ref_un[: res.uses_no_data.size])
    info = get_lerc_info(blob)
    ref_info = oracle.blob_info(blob)
    assert info.n_bands == ref_info["nBands"]
    assert info.n_masks == ref_info["nMasks"]
    assert info.blob_size == ref_info["blobSize"]
    return blob, res


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("max_z_err", [0.0, 0.001, 0.1, 1.0])
def test_all_dtypes_lossy_lossless(dtype, max_z_err):
    data = make_data(dtype, 1, 67, 83, 1)
    roundtrip_vs_oracle(data, None, max_z_err)


@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.float32])
def test_with_mask(dtype):
    data = make_data(dtype, 1, 64, 64, 1)
    mask = (RNG.random((1, 64, 64)) > 0.35).astype(np.uint8)
    roundtrip_vs_oracle(data, mask, 0.01 if dtype == np.float32 else 0.5)


@pytest.mark.parametrize("n_bands", [2, 3])
@pytest.mark.parametrize("per_band_mask", [False, True])
def test_multiband_masks(n_bands, per_band_mask):
    data = make_data(np.float32, n_bands, 40, 56, 1)
    if per_band_mask:
        masks = (RNG.random((n_bands, 40, 56)) > 0.3).astype(np.uint8)
    else:
        masks = (RNG.random((1, 40, 56)) > 0.3).astype(np.uint8)
    roundtrip_vs_oracle(data, masks, 0.001)


@pytest.mark.parametrize("n_depth", [2, 3, 8])
def test_ndepth(n_depth):
    data = make_data(np.float32, 2, 33, 47, n_depth)
    roundtrip_vs_oracle(data, None, 0.01)
    # int path with depth-diff encoding (v >= 5 lossless int)
    idata = make_data(np.int16, 2, 33, 47, n_depth)
    roundtrip_vs_oracle(idata, None, 0.0)


def test_const_image():
    for dtype in [np.uint8, np.float32]:
        data = make_data(dtype, 1, 30, 30, 1, kind="const")
        roundtrip_vs_oracle(data, None, 0.0)


def test_empty_mask():
    data = make_data(np.float32, 1, 25, 25, 1)
    mask = np.zeros((1, 25, 25), dtype=np.uint8)
    roundtrip_vs_oracle(data, mask, 0.01)


def test_segmented_lut_path():
    # few distinct values with spread range -> LUT blocks
    data = make_data(np.float32, 1, 80, 80, 1, kind="segmented")
    roundtrip_vs_oracle(data, None, 0.5)


def test_byte_huffman_path():
    # uint8 lossless with skewed histogram -> Huffman image mode
    base = make_data(np.uint8, 1, 90, 110, 1, kind="smooth")
    roundtrip_vs_oracle(base, None, 0.0)
    # with mask (delta-huffman with mask chain)
    mask = (RNG.random((1, 90, 110)) > 0.25).astype(np.uint8)
    roundtrip_vs_oracle(base, mask, 0.0)
    # char type (offset 128)
    cdata = make_data(np.int8, 1, 90, 110, 1, kind="smooth")
    roundtrip_vs_oracle(cdata, mask, 0.0)


def test_noisy_one_sweep_path():
    data = make_data(np.float32, 1, 50, 50, 1, kind="noisy")
    roundtrip_vs_oracle(data, None, 0.0)


@pytest.mark.parametrize("version", [2, 3, 4, 5, 6])
def test_old_codec_versions(version):
    data = make_data(np.float32, 2, 45, 61, 1)
    mask = (RNG.random((1, 45, 61)) > 0.3).astype(np.uint8)
    roundtrip_vs_oracle(data, mask, 0.001, version=version)
    bdata = make_data(np.uint8, 1, 45, 61, 1)
    roundtrip_vs_oracle(bdata, None, 0.0, version=version)


def test_nodata_4d_mixed_case():
    # nDepth > 1 with a mix of valid/invalid values at the same pixel -> noData path
    n_bands, n_rows, n_cols, n_depth = 2, 30, 40, 3
    data = make_data(np.float32, n_bands, n_rows, n_cols, n_depth)
    nodata_val = -9999.0
    # poke noData into some depth slices at valid pixels
    sel = RNG.random((n_bands, n_rows, n_cols, n_depth)) < 0.1
    data[sel] = nodata_val
    uses = np.ones(n_bands, dtype=np.uint8)
    ndvals = np.full(n_bands, nodata_val)
    roundtrip_vs_oracle(data, None, 0.0, uses_nodata=uses, nodata=ndvals)


def test_large_values_int32():
    data = (RNG.integers(-2**30, 2**30, (1, 40, 40, 1))).astype(np.int32)
    roundtrip_vs_oracle(data, None, 0.0)


def test_bitplane_cheat_code():
    # maxZError 777 -> bit-plane noise cut for integer types
    data = make_data(np.int16, 1, 100, 100, 1, kind="smooth")
    noisy = data + RNG.integers(0, 2, data.shape).astype(np.int16)
    roundtrip_vs_oracle(noisy, None, 777)
