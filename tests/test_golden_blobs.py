"""Golden tests: the three blobs shipped with the reference decode bit-exact."""
import os

import numpy as np
import pytest

from lerc_tpu.codec.orchestrator import decode_blob, get_lerc_info

from . import oracle

TESTDATA = "/root/reference/testData"

pytestmark = pytest.mark.skipif(not oracle.available(), reason="reference lib not built")


@pytest.mark.parametrize(
    "name", ["california_400_400_1_float.lerc2", "bluemarble_256_256_3_byte.lerc2", "world.lerc1"]
)
def test_golden_decode_bit_exact(name):
    with open(os.path.join(TESTDATA, name), "rb") as f:
        blob = f.read()
    res = decode_blob(blob)
    ref_data, ref_masks, _, _ = oracle.decode(blob)
    assert np.array_equal(res.data, ref_data)
    if ref_masks is not None:
        m = ref_masks.astype(bool)
        assert np.array_equal(res.masks[: m.shape[0]], m)
    info = get_lerc_info(blob)
    ref_info = oracle.blob_info(blob)
    assert info.n_bands == ref_info["nBands"]
    assert info.n_cols == ref_info["nCols"]
    assert info.n_rows == ref_info["nRows"]
    assert int(info.dt) == ref_info["dataType"]
    assert info.num_valid_pixel == ref_info["nValidPixels"]
    assert abs(info.z_min - ref_info["zMin"]) < 1e-9
    assert abs(info.z_max - ref_info["zMax"]) < 1e-9


@pytest.mark.parametrize(
    "name", ["california_400_400_1_float.lerc2", "bluemarble_256_256_3_byte.lerc2"]
)
def test_golden_reencode_roundtrip(name):
    """BASELINE config: decode golden blob, re-encode lossless with our encoder,
    decode with the REFERENCE library, require bit-exact pixels + masks."""
    from lerc_tpu.codec.encode_orchestrator import encode_blob

    with open(os.path.join(TESTDATA, name), "rb") as f:
        blob = f.read()
    res = decode_blob(blob)
    masks = res.masks.astype(np.uint8)
    n_masks = masks.shape[0]
    if np.all(masks == masks[0:1]):
        masks = masks[0:1]
    our_blob = encode_blob(res.data, masks, 0.0)
    ref_data, ref_masks, _, _ = oracle.decode(our_blob)
    assert np.array_equal(ref_data, res.data)
    if ref_masks is not None:
        assert np.array_equal(ref_masks.astype(bool)[0], res.masks[0])
    # and our own decoder agrees
    res2 = decode_blob(our_blob)
    assert np.array_equal(res2.data, res.data)
    assert np.array_equal(res2.masks, res.masks)


def test_golden_blobs_reencode_device():
    """Decode the shipped golden blobs and re-encode through the DEVICE
    encoder; the reference library must accept the new blob and decode it
    bit-exactly (lossless)."""
    import numpy as np

    from lerc_tpu.codec.device_codec import encode_band_device
    from lerc_tpu.codec.orchestrator import decode_blob
    from . import oracle

    if not oracle.available():
        import pytest

        pytest.skip("reference lib not built")

    # bluemarble: 3-band uint8 -> device whole-image Huffman per band
    blob = open(os.path.join(TESTDATA, "bluemarble_256_256_3_byte.lerc2"), "rb").read()
    res = decode_blob(blob)
    for band in range(res.data.shape[0]):
        b2 = encode_band_device(res.data[band], None, 0)
        ref = oracle.decode(b2)[0].reshape(256, 256)
        np.testing.assert_array_equal(ref, res.data[band, :, :, 0])

    # california: float32 -> device fpl lossless re-encode of the decoded DEM
    blob = open(os.path.join(TESTDATA, "california_400_400_1_float.lerc2"), "rb").read()
    res = decode_blob(blob)
    data = res.data[0].copy()
    data[~res.masks[0]] = 0  # device encoder is all-valid; mask region zeroed
    b2 = encode_band_device(np.ascontiguousarray(data), None, 0.0)
    ref = oracle.decode(b2)[0].reshape(400, 400)
    np.testing.assert_array_equal(ref, data[:, :, 0])
