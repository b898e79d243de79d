"""Native FLAC decoder round-trip tests (qasr/native/flac_decode.cpp).

No FLAC encoder exists in this container, so these tests carry their own
minimal spec-conformant encoder (bit-exact FLAC subset: STREAMINFO, frame
headers with CRC-8, constant/verbatim/fixed/LPC subframes, rice residual
partitions incl. escapes, left/side stereo). The native decoder must
reproduce the original PCM exactly.
"""

import numpy as np
import pytest

from qasr.native import flac_decode_native, flac_probe


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int):
        assert 0 <= value < (1 << nbits) or nbits == 0
        self.acc = (self.acc << nbits) | value
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, nbits: int):
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int):
        self.write(0, 0)
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def rice_encode(w: BitWriter, residuals, param: int, plen: int):
    w.write(param, plen)
    for x in residuals:
        v = (int(x) << 1) ^ (int(x) >> 63) if int(x) >= 0 else ((-int(x)) << 1) - 1
        w.write_unary(v >> param)
        if param:
            w.write(v & ((1 << param) - 1), param)


def encode_residual(w: BitWriter, residuals, *, param=3, porder=0, escape=False):
    plen, esc = (4, 0xF)
    w.write(0, 2)  # method 0: 4-bit rice params
    w.write(porder, 4)
    nparts = 1 << porder
    n = len(residuals)
    # every partition holds blocksize>>porder samples except the first, which
    # is short by the predictor order; with n = blocksize - order that is
    # per = ceil(n / nparts) (valid while order < nparts or porder == 0)
    per = (n + (nparts - 1)) // nparts if nparts > 1 else n
    idx = 0
    for p in range(nparts):
        count = n - per * (nparts - 1) if p == 0 else per
        part = residuals[idx : idx + count]
        idx += count
        if escape:
            w.write(esc, plen)
            w.write(17, 5)
            for x in part:
                w.write_signed(int(x), 17)
        else:
            rice_encode(w, part, param, plen)


FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


class FlacEncoder:
    def __init__(self, sample_rate=16000, channels=1, bps=16):
        self.sr = sample_rate
        self.ch = channels
        self.bps = bps

    def streaminfo(self, total: int, blocksize: int) -> bytes:
        w = BitWriter()
        w.write(0x80 | 0, 8)  # last metadata block, type 0
        w.write(34, 24)
        w.write(blocksize, 16)
        w.write(blocksize, 16)
        w.write(0, 24)
        w.write(0, 24)
        w.write(self.sr, 20)
        w.write(self.ch - 1, 3)
        w.write(self.bps - 1, 5)
        w.write(total, 36)
        for _ in range(16):
            w.write(0, 8)
        return w.getvalue()

    def frame_header(self, frame_no: int, blocksize: int, ch_code: int) -> bytes:
        w = BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed blocksize stream
        w.write(7, 4)  # blocksize: 16-bit field follows
        w.write(0, 4)  # sample rate: from STREAMINFO
        w.write(ch_code, 4)
        w.write(0, 3)  # sample size: from STREAMINFO
        w.write(0, 1)
        assert frame_no < 128
        w.write(frame_no, 8)  # UTF-8 single byte
        w.write(blocksize - 1, 16)
        hdr = w.getvalue()
        return hdr + bytes([crc8(hdr)])

    def subframe(self, w: BitWriter, samples, kind, bps, **kw):
        w.write(0, 1)
        if kind == "constant":
            w.write(0, 6)
            w.write(0, 1)
            w.write_signed(int(samples[0]), bps)
        elif kind == "verbatim":
            w.write(1, 6)
            w.write(0, 1)
            for x in samples:
                w.write_signed(int(x), bps)
        elif kind == "fixed":
            order = kw.get("order", 2)
            w.write(0b001000 | order, 6)
            w.write(0, 1)
            for x in samples[:order]:
                w.write_signed(int(x), bps)
            res = []
            coefs = FIXED_COEFS[order]
            for i in range(order, len(samples)):
                pred = sum(c * int(samples[i - 1 - j]) for j, c in enumerate(coefs))
                res.append(int(samples[i]) - pred)
            encode_residual(w, res, **{k: v for k, v in kw.items() if k != "order"})
        elif kind == "lpc":
            order = len(kw["coefs"])
            shift = kw.get("shift", 0)
            w.write(0b100000 | (order - 1), 6)
            w.write(0, 1)
            for x in samples[:order]:
                w.write_signed(int(x), bps)
            w.write(15 - 1, 4)  # precision 15
            w.write_signed(shift, 5)
            for c in kw["coefs"]:
                w.write_signed(int(c), 15)
            res = []
            for i in range(order, len(samples)):
                pred = sum(
                    int(c) * int(samples[i - 1 - j])
                    for j, c in enumerate(kw["coefs"])
                )
                res.append(int(samples[i]) - (pred >> shift))
            encode_residual(w, res, escape=kw.get("escape", False))
        else:
            raise ValueError(kind)

    def encode(self, pcm: np.ndarray, blocksize=256, kinds=("verbatim",), **kw):
        """pcm: [n] mono or [n, 2] stereo int; kinds cycles per frame."""
        if pcm.ndim == 1:
            pcm = pcm[:, None]
        n = pcm.shape[0]
        out = b"fLaC" + self.streaminfo(n, blocksize)
        frame_no = 0
        for start in range(0, n, blocksize):
            chunk = pcm[start : start + blocksize]
            kind = kinds[frame_no % len(kinds)]
            stereo_mode = kw.get("stereo_mode", "indep")
            if self.ch == 1:
                ch_code = 0
            elif stereo_mode == "left_side":
                ch_code = 8
            else:
                ch_code = 1
            out += self.frame_header(frame_no, chunk.shape[0], ch_code)
            w = BitWriter()
            if self.ch == 1:
                self.subframe(w, chunk[:, 0], kind, self.bps, **{
                    k: v for k, v in kw.items() if k != "stereo_mode"})
            elif stereo_mode == "left_side":
                side = chunk[:, 0].astype(np.int64) - chunk[:, 1].astype(np.int64)
                self.subframe(w, chunk[:, 0], kind, self.bps)
                self.subframe(w, side, kind, self.bps + 1)
            else:
                for c in range(self.ch):
                    self.subframe(w, chunk[:, c], kind, self.bps)
            w.align()
            w.write(0, 16)  # frame CRC-16 (decoder skips it)
            out += w.getvalue()
            frame_no += 1
        return out


def roundtrip(tmp_path, pcm, channels=1, **kw):
    enc = FlacEncoder(channels=channels)
    path = str(tmp_path / "t.flac")
    with open(path, "wb") as f:
        f.write(enc.encode(np.asarray(pcm), **kw))
    dec, sr = flac_decode_native(path)
    assert sr == 16000
    want = np.asarray(pcm)
    if want.ndim == 1:
        want = want[:, None]
    np.testing.assert_array_equal(dec, want)
    return dec


class TestFlacDecoder:
    def test_probe(self, tmp_path):
        pcm = np.arange(-100, 400, dtype=np.int64)
        enc = FlacEncoder()
        path = str(tmp_path / "p.flac")
        with open(path, "wb") as f:
            f.write(enc.encode(pcm))
        info = flac_probe(path)
        assert info == {
            "n_samples": 500, "channels": 1, "sample_rate": 16000, "bps": 16
        }

    def test_verbatim_multiframe_odd_tail(self, tmp_path):
        rng = np.random.RandomState(0)
        pcm = rng.randint(-(1 << 15), 1 << 15, size=777, dtype=np.int64)
        roundtrip(tmp_path, pcm, blocksize=256, kinds=("verbatim",))

    def test_constant(self, tmp_path):
        roundtrip(tmp_path, np.full(512, -12345, np.int64), kinds=("constant",))

    @pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
    def test_fixed_orders(self, tmp_path, order):
        rng = np.random.RandomState(order)
        # smooth signal keeps residuals small for rice param 3
        t = np.arange(600)
        pcm = (1000 * np.sin(t / 17.0)).astype(np.int64) + rng.randint(
            -3, 4, size=600
        )
        roundtrip(tmp_path, pcm, blocksize=200, kinds=("fixed",), order=order)

    def test_rice_partitions(self, tmp_path):
        rng = np.random.RandomState(5)
        pcm = np.cumsum(rng.randint(-5, 6, size=512)).astype(np.int64)
        roundtrip(
            tmp_path, pcm, blocksize=256, kinds=("fixed",), order=1, porder=2
        )

    def test_escape_partition(self, tmp_path):
        rng = np.random.RandomState(6)
        pcm = rng.randint(-30000, 30000, size=256, dtype=np.int64)
        roundtrip(
            tmp_path, pcm, blocksize=256, kinds=("fixed",), order=0, escape=True
        )

    def test_lpc(self, tmp_path):
        rng = np.random.RandomState(7)
        t = np.arange(512)
        pcm = (2000 * np.sin(t / 9.0)).astype(np.int64) + rng.randint(
            -2, 3, size=512
        )
        roundtrip(
            tmp_path, pcm, blocksize=256, kinds=("lpc",),
            coefs=[3, -3, 1], shift=1,
        )

    def test_stereo_independent_and_left_side(self, tmp_path):
        rng = np.random.RandomState(8)
        pcm = rng.randint(-20000, 20000, size=(400, 2), dtype=np.int64)
        roundtrip(tmp_path, pcm, channels=2, blocksize=128, kinds=("verbatim",))
        roundtrip(
            tmp_path, pcm, channels=2, blocksize=128, kinds=("verbatim",),
            stereo_mode="left_side",
        )

    def test_mixed_subframe_kinds_across_frames(self, tmp_path):
        t = np.arange(1024)
        pcm = (500 * np.sin(t / 23.0)).astype(np.int64)
        roundtrip(
            tmp_path, pcm, blocksize=256, kinds=("verbatim", "fixed"), order=2
        )

    def test_bad_magic_raises(self, tmp_path):
        path = str(tmp_path / "bad.flac")
        with open(path, "wb") as f:
            f.write(b"RIFFxxxx")
        with pytest.raises(ValueError, match="fLaC"):
            flac_probe(path)

    def test_librispeech_loader_reads_flac(self, tmp_path):
        from qasr.data.librispeech import LibriSpeechDataset

        d = tmp_path / "ls" / "train-clean-100" / "19" / "198"
        d.mkdir(parents=True)
        rng = np.random.RandomState(9)
        pcm = rng.randint(-10000, 10000, size=333, dtype=np.int64)
        with open(d / "19-198-0000.flac", "wb") as f:
            f.write(FlacEncoder().encode(pcm))
        with open(d / "19-198.trans.txt", "w") as f:
            f.write("19-198-0000 HELLO WORLD\n")
        ds = LibriSpeechDataset(str(tmp_path / "ls"), "train-clean-100")
        assert len(ds) == 1
        samples, ids = ds.load(0)
        np.testing.assert_allclose(samples, pcm / 32768.0, atol=1e-7)
        assert ids.tolist() == [
            10, 7, 14, 14, 17, 1, 25, 17, 20, 14, 6
        ]  # H E L L O _ W O R L D
