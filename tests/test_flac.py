"""Native FLAC decoder tests.

No FLAC encoder exists in this environment, so the tests include a minimal
spec-following encoder (verbatim and fixed-order-1 Rice-coded subframes,
mono and stereo/left-side) and round-trip the C++ decoder against it.
"""

import numpy as np
import pytest


class BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def write_unary(self, q: int):
        self.bits.extend([0] * q + [1])

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self) -> bytes:
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            v = 0
            for b in self.bits[i : i + 8]:
                v = (v << 1) | b
            out.append(v)
        return bytes(out)


def _streaminfo(sample_rate: int, channels: int, bits: int, total: int) -> bytes:
    w = BitWriter()
    w.write(4096, 16)  # min block
    w.write(4096, 16)  # max block
    w.write(0, 24)  # min frame size
    w.write(0, 24)  # max frame size
    w.write(sample_rate, 20)
    w.write(channels - 1, 3)
    w.write(bits - 1, 5)
    w.write(total, 36)
    body = w.bytes() + b"\x00" * 16  # md5 zeros
    header = bytes([0x80, 0, 0, len(body)])  # last block, type 0
    return b"fLaC" + header + body


def _frame_header(w: BitWriter, block_size: int, channel_code: int, frame_no: int):
    w.write(0b11111111111110, 14)
    w.write(0, 1)  # reserved
    w.write(0, 1)  # fixed blocksize strategy
    w.write(7, 4)  # blocksize: 16-bit value follows
    w.write(0, 4)  # sample rate: from streaminfo
    w.write(channel_code, 4)
    w.write(0, 3)  # sample size: from streaminfo
    w.write(0, 1)  # reserved
    assert frame_no < 128
    w.write(frame_no, 8)  # utf8 single byte
    w.write(block_size - 1, 16)
    w.write(0, 8)  # crc8 (decoder does not verify)


def _signed(w: BitWriter, v: int, n: int):
    w.write(v & ((1 << n) - 1), n)


def _verbatim_subframe(w: BitWriter, samples, bits: int):
    w.write(0, 1)
    w.write(1, 6)  # verbatim
    w.write(0, 1)  # no wasted bits
    for s in samples:
        _signed(w, int(s), bits)


def _fixed1_subframe(w: BitWriter, samples, bits: int, rice: int = 4):
    w.write(0, 1)
    w.write(8 + 1, 6)  # fixed, order 1
    w.write(0, 1)
    _signed(w, int(samples[0]), bits)  # warmup
    w.write(0, 2)  # residual method: rice 4-bit
    w.write(0, 4)  # partition order 0
    w.write(rice, 4)
    for i in range(1, len(samples)):
        r = int(samples[i]) - int(samples[i - 1])
        u = 2 * r if r >= 0 else -2 * r - 1
        w.write_unary(u >> rice)
        if rice:
            w.write(u & ((1 << rice) - 1), rice)


def encode_flac(samples: np.ndarray, sample_rate=16000, mode="verbatim") -> bytes:
    """samples: [T] or [C, T] int16."""
    if samples.ndim == 1:
        samples = samples[None]
    channels, total = samples.shape
    blob = _streaminfo(sample_rate, channels, 16, total)
    block = 4096
    frames = bytearray()
    for f, start in enumerate(range(0, total, block)):
        chunk = samples[:, start : start + block]
        w = BitWriter()
        _frame_header(w, chunk.shape[1], channels - 1, f)
        for c in range(channels):
            if mode == "verbatim":
                _verbatim_subframe(w, chunk[c], 16)
            else:
                _fixed1_subframe(w, chunk[c], 16)
        w.align()
        w.write(0, 16)  # crc16 (unverified)
        frames += w.bytes()
    return blob + bytes(frames)


@pytest.fixture(scope="module")
def flac_lib():
    from audiodeepfake_detection_tpu.data.wavio import _load_flac_lib

    lib = _load_flac_lib()
    if lib is None:
        pytest.skip("libflacdec.so not built")
    return lib


class TestFlacDecoder:
    @pytest.mark.parametrize("mode", ["verbatim", "fixed"])
    def test_mono_roundtrip(self, tmp_path, flac_lib, mode):
        from audiodeepfake_detection_tpu.data.wavio import flac_info, flac_read

        rng = np.random.RandomState(0)
        pcm = (rng.randn(10000) * 3000).astype(np.int16)
        path = str(tmp_path / f"test_{mode}.flac")
        with open(path, "wb") as fh:
            fh.write(encode_flac(pcm, mode=mode))
        sr, n, ch, bits = flac_info(path)
        assert (sr, n, ch, bits) == (16000, 10000, 1, 16)
        audio, sr2 = flac_read(path)
        assert sr2 == 16000
        np.testing.assert_allclose(audio, pcm / 32768.0, atol=1e-6)

    def test_offset_read(self, tmp_path, flac_lib):
        from audiodeepfake_detection_tpu.data.wavio import flac_read

        pcm = np.arange(-4000, 4000, dtype=np.int16)
        path = str(tmp_path / "ramp.flac")
        with open(path, "wb") as fh:
            fh.write(encode_flac(pcm))
        audio, _ = flac_read(path, frame_offset=5000, num_frames=1000)
        np.testing.assert_allclose(
            audio, pcm[5000:6000] / 32768.0, atol=1e-6
        )

    def test_stereo_left_side(self, tmp_path, flac_lib):
        """Channel assignment 8 (left/side): channel 0 must decode as left."""
        from audiodeepfake_detection_tpu.data.wavio import flac_read

        rng = np.random.RandomState(1)
        left = (rng.randn(4096) * 2000).astype(np.int16)
        right = (rng.randn(4096) * 2000).astype(np.int16)
        side = left.astype(np.int32) - right.astype(np.int32)

        blob = _streaminfo(16000, 2, 16, 4096)
        w = BitWriter()
        _frame_header(w, 4096, 8, 0)  # left/side assignment
        _verbatim_subframe(w, left, 16)
        _verbatim_subframe(w, side, 17)  # side channel gets +1 bit
        w.align()
        w.write(0, 16)
        path = str((__import__("pathlib").Path(tmp_path)) / "ls.flac")
        with open(path, "wb") as fh:
            fh.write(blob + w.bytes())
        audio, _ = flac_read(path)
        np.testing.assert_allclose(audio, left / 32768.0, atol=1e-6)

    def test_dataset_pipeline_with_flac(self, tmp_path, flac_lib):
        """Index build + loader over a flac corpus (ASVspoof-style)."""
        from audiodeepfake_detection_tpu.data.dataset import get_custom_dataset
        from audiodeepfake_detection_tpu.data.loader import FrameLoader

        rng = np.random.RandomState(2)
        for d, amp in (("A_asv2019real", 2000), ("B_asv2019fake", 500)):
            (tmp_path / d).mkdir()
            for i in range(2):
                pcm = (rng.randn(32000) * amp).astype(np.int16)
                with open(tmp_path / d / f"LA_T_{i}.flac", "wb") as fh:
                    fh.write(encode_flac(pcm, mode="fixed"))
        ds = get_custom_dataset(
            data_path=str(tmp_path),
            ds_type="train",
            only_use=["asv2019real", "asv2019fake"],
            save_path=str(tmp_path / "meta"),
            limit=100,
            asvspoof_name="LA_T",
            file_type="flac",
            resample_rate=16000,
            seconds=2,
            train_ratio=1.0,
            val_ratio=0.0,
        )
        assert len(ds) == 4  # one 2s frame per file, both labels
        loader = FrameLoader(ds, batch_size=2)
        batch = next(iter(loader.epoch(0)))
        assert batch["audio"].shape == (2, 1, 32000)
        assert np.abs(batch["audio"]).max() > 0


def _lpc2_subframe(w: BitWriter, samples, bits: int, rice: int = 6):
    """Order-2 LPC subframe: predictor (c0*s[-1] + c1*s[-2]) >> shift."""
    order, prec, shift = 2, 12, 5
    c0, c1 = 2 << shift, -(1 << shift)  # 2*s[-1] - s[-2]
    w.write(0, 1)
    w.write(32 + (order - 1), 6)
    w.write(0, 1)  # no wasted bits
    for s in samples[:order]:
        _signed(w, int(s), bits)
    w.write(prec - 1, 4)
    _signed(w, shift, 5)
    _signed(w, c0, prec)
    _signed(w, c1, prec)
    w.write(0, 2)  # rice method 0
    w.write(0, 4)  # partition order 0
    w.write(rice, 4)
    for i in range(order, len(samples)):
        pred = (c0 * int(samples[i - 1]) + c1 * int(samples[i - 2])) >> shift
        r = int(samples[i]) - pred
        u = 2 * r if r >= 0 else -2 * r - 1
        w.write_unary(u >> rice)
        if rice:
            w.write(u & ((1 << rice) - 1), rice)


class TestFlacLPC:
    def test_lpc_roundtrip(self, tmp_path, flac_lib):
        from audiodeepfake_detection_tpu.data.wavio import flac_read

        rng = np.random.RandomState(3)
        # smooth signal so order-2 LPC residuals stay small
        t = np.arange(4096)
        pcm = (8000 * np.sin(2 * np.pi * t / 64) + rng.randn(4096) * 50).astype(
            np.int16
        )
        blob = _streaminfo(16000, 1, 16, 4096)
        w = BitWriter()
        _frame_header(w, 4096, 0, 0)
        _lpc2_subframe(w, pcm, 16)
        w.align()
        w.write(0, 16)
        path = str(tmp_path / "lpc.flac")
        with open(path, "wb") as fh:
            fh.write(blob + w.bytes())
        audio, sr = flac_read(path)
        assert sr == 16000
        np.testing.assert_allclose(audio, pcm / 32768.0, atol=1e-6)
