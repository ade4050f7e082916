"""Native C++ PNG decoder tests (native/dataload + data/native_io.py).

The decoder must be byte-identical to the OpenCV path on every format the
datasets use (SURVEY.md §9.5: 8-bit images, 16-bit flow/disparity GT), and
data/io.py must transparently prefer it with a working OpenCV fallback."""

import os
import subprocess

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from cerberusnet_tpu.data import io as data_io
from cerberusnet_tpu.data import native_io

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def built_library():
    if not native_io.available():
        rc = subprocess.run(
            ["make", "-C", os.path.join(REPO, "native", "dataload")],
            capture_output=True,
        ).returncode
        if rc != 0 or not native_io.available():
            pytest.skip("native decoder not buildable here")


class TestNativeDecode:
    @pytest.mark.parametrize(
        "shape,dtype",
        [
            ((37, 53, 3), np.uint8),
            ((41, 29), np.uint8),
            ((33, 47), np.uint16),
            ((21, 19, 3), np.uint16),
            ((1, 1), np.uint8),
            ((2, 513), np.uint16),  # odd width exercises filter edges
        ],
    )
    def test_byte_identical_to_opencv_write(self, tmp_path, shape, dtype):
        rng = np.random.RandomState(hash(shape) % 2**31)
        hi = 256 if dtype == np.uint8 else 65536
        ref = rng.randint(0, hi, shape).astype(dtype)
        p = str(tmp_path / "img.png")
        enc = ref if ref.ndim == 2 else cv2.cvtColor(ref, cv2.COLOR_RGB2BGR)
        assert cv2.imwrite(p, enc)
        got = native_io.decode_png(p)
        assert got.shape == ref.shape and got.dtype == ref.dtype
        np.testing.assert_array_equal(got, ref)

    def test_missing_file_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            native_io.decode_png(str(tmp_path / "nope.png"))

    def test_not_a_png_raises(self, tmp_path):
        p = tmp_path / "junk.png"
        p.write_bytes(b"definitely not a png")
        with pytest.raises(ValueError):
            native_io.decode_png(str(p))

    def test_io_module_native_equals_opencv(self, tmp_path, monkeypatch):
        """data/io.py readers give identical arrays with the native decoder
        on and off (the loader-facing contract)."""
        rng = np.random.RandomState(7)
        rgb = rng.randint(0, 256, (24, 31, 3), np.uint8)
        g16 = rng.randint(0, 65536, (24, 31), np.uint16)
        p_rgb = str(tmp_path / "rgb.png")
        p_g16 = str(tmp_path / "g16.png")
        data_io.write_image_u8(p_rgb, rgb)
        data_io.write_png16(p_g16, g16)
        monkeypatch.setenv("CERBERUS_NATIVE_DECODE", "1")
        a_rgb, a_g16 = data_io.read_image_u8(p_rgb), data_io.read_png16(p_g16)
        monkeypatch.setenv("CERBERUS_NATIVE_DECODE", "0")
        b_rgb, b_g16 = data_io.read_image_u8(p_rgb), data_io.read_png16(p_g16)
        np.testing.assert_array_equal(a_rgb, b_rgb)
        np.testing.assert_array_equal(a_g16, b_g16)
        np.testing.assert_array_equal(a_rgb, rgb)
        np.testing.assert_array_equal(a_g16, g16)


class TestNativePreprocess:
    """cnt_png_to_input (the C++ serving path's decode+normalize+cast) vs
    the Python pipeline (read_image_u8 -> encodings.preprocess_image ->
    astype). The C++ does literal IEEE f32 (x/255 - m)/s; XLA folds the
    divisions into reciprocal multiplies, so results agree to ~2 f32 ULP —
    assert that bound, not bitwise equality."""

    @pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
    def test_matches_python_pipeline_1ulp(self, tmp_path, dtype):
        from cerberusnet_tpu.data import encodings

        rng = np.random.RandomState(11)
        img = rng.randint(0, 256, (48, 64, 3), np.uint8)
        p = str(tmp_path / "frame.png")
        data_io.write_image_u8(p, img)

        native = native_io.png_to_input(p, (48, 64), dtype)
        ref32 = np.asarray(
            encodings.preprocess_image(data_io.read_image_u8(p)[None])
        )
        assert native.shape == ref32.shape == (1, 48, 64, 3)
        if dtype == "float32":
            # a-few-ULP bound (absolute floor for values near zero, where
            # u/255 ~ imagenet_mean): catches any real defect (wrong channel
            # order / constant / rounding mode) while tolerating XLA's
            # reassociation of the two divisions
            np.testing.assert_allclose(native, ref32, rtol=1e-6, atol=5e-7)
        else:
            ref = ref32.astype(native.dtype)
            bits_n = native.view(np.uint16).astype(np.int32)
            bits_r = ref.view(np.uint16).astype(np.int32)
            ulp = np.abs(bits_n - bits_r)
            assert ulp.max() <= 1  # rounding-boundary pixels only
            assert (ulp == 0).mean() > 0.995

    def test_wrong_size_rejected(self, tmp_path):
        rng = np.random.RandomState(12)
        data_io.write_image_u8(
            str(tmp_path / "f.png"), rng.randint(0, 256, (8, 8, 3), np.uint8)
        )
        with pytest.raises(ValueError):
            native_io.png_to_input(str(tmp_path / "f.png"), (16, 16))
