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
