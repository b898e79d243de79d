"""TIMIT reader + feature pipeline tests on synthetic fixture corpora
(SURVEY.md §4 test 5; no real TIMIT audio in this container)."""

import os
import struct

import numpy as np
import pytest

from qasr.configs import get_config
from qasr.data.timit import (
    CORE_TEST_SPEAKERS,
    FOLD_61_TO_39,
    PHONE_TO_ID,
    TIMIT_61,
    TimitDataset,
    read_phn,
    read_sphere,
    write_riff,
)


class TestPhoneInventory:
    """The id space must fit the 62-class CTC vocab (0 = blank, 1..61 =
    phones). A 62nd phone in the inventory once put 'zh' at id 62 — out of
    range for the softmax — which silently corrupted the CTC lattice
    (out-of-range one-hot = all-zero row = free probability-1 emission,
    'loss' went negative) and made 'zh' undecodable."""

    def test_exactly_61_unique_phones(self):
        assert len(TIMIT_61) == 61
        assert len(set(TIMIT_61)) == 61
        assert max(PHONE_TO_ID.values()) == 61
        assert min(PHONE_TO_ID.values()) == 1  # 0 is the CTC blank

    def test_fold_produces_exactly_39_classes(self):
        folded = {FOLD_61_TO_39.get(p, p) for p in TIMIT_61} - {None}
        assert len(folded) == 39
        assert "sil" in folded and "q" not in folded

    def test_fold_keys_subset_of_inventory(self):
        assert set(FOLD_61_TO_39) <= set(TIMIT_61)

    def test_out_of_range_labels_rejected(self):
        from qasr.train.loop import _check_labels

        ok = {"labels": np.array([[1, 61, 0]], np.int32)}
        _check_labels(ok, vocab=62)
        bad = {"labels": np.array([[1, 62, 0]], np.int32)}
        with pytest.raises(ValueError, match="out of range"):
            _check_labels(bad, vocab=62)


def _write_nist(path, samples, rate=16000):
    data = samples.astype("<i2").tobytes()
    header = (
        "NIST_1A\n   1024\n"
        f"sample_count -i {len(samples)}\n"
        f"sample_rate -i {rate}\n"
        "channel_count -i 1\n"
        "sample_byte_format -s2 01\n"
        "sample_coding -s3 pcm\n"
        "end_head\n"
    ).encode("ascii")
    with open(path, "wb") as f:
        f.write(header + b" " * (1024 - len(header)))
        f.write(data)


def _write_phn(path, phones):
    with open(path, "w") as f:
        t = 0
        for p in phones:
            f.write(f"{t} {t + 800} {p}\n")
            t += 800


@pytest.fixture(scope="module")
def fixture_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("timit")
    rng = np.random.RandomState(0)

    def utt(split_dir, speaker, name, nist=False):
        d = root / split_dir / "dr1" / speaker
        d.mkdir(parents=True, exist_ok=True)
        wav = (rng.randn(12000) * 3000).astype(np.int16)
        if nist:
            _write_nist(str(d / f"{name}.wav"), wav)
        else:
            write_riff(str(d / f"{name}.wav"), wav)
        _write_phn(str(d / f"{name}.phn"), ["h#", "sh", "iy", "h#"])

    utt("train", "mabc0", "si1", nist=False)
    utt("train", "mabc0", "si2", nist=True)
    utt("train", "mabc0", "sa1")  # SA sentence: must be excluded
    utt("train", "fdef0", "sx3")
    core = sorted(CORE_TEST_SPEAKERS)[0]
    utt("test", core, "si4")
    utt("test", "mzzz9", "si5")  # non-core test speaker -> dev
    return str(root)


class TestSphereReaders:
    def test_riff_roundtrip(self, tmp_path):
        wav = (np.sin(np.linspace(0, 100, 4000)) * 10000).astype(np.int16)
        p = str(tmp_path / "x.wav")
        write_riff(p, wav)
        got, rate = read_sphere(p)
        assert rate == 16000
        np.testing.assert_array_equal(got, wav)

    def test_nist_roundtrip(self, tmp_path):
        wav = (np.cos(np.linspace(0, 50, 3000)) * 8000).astype(np.int16)
        p = str(tmp_path / "x.wav")
        _write_nist(p, wav)
        got, rate = read_sphere(p)
        assert rate == 16000
        np.testing.assert_array_equal(got, wav)

    def test_phn(self, tmp_path):
        p = str(tmp_path / "x.phn")
        _write_phn(p, ["h#", "ae", "q", "h#"])
        assert read_phn(p) == ["h#", "ae", "q", "h#"]


class TestTimitDataset:
    def test_train_split_excludes_sa(self, fixture_corpus):
        ds = TimitDataset(fixture_corpus, "train")
        names = [os.path.basename(u.wav_path) for u in ds.utterances]
        assert "sa1.wav" not in names
        assert len(ds) == 3

    def test_core_and_dev_splits(self, fixture_corpus):
        core = TimitDataset(fixture_corpus, "core_test")
        assert len(core) == 1
        # fixture speaker is not in the standard 50-speaker dev list, so the
        # dev split falls back to all non-core test speakers
        dev = TimitDataset(fixture_corpus, "dev")
        assert len(dev) == 1
        full = TimitDataset(fixture_corpus, "full_test")
        assert len(full) == 2

    def test_dev_prefers_standard_speaker_list(self, fixture_corpus):
        # add an utterance for a standard dev speaker: once present, the dev
        # split is exactly the Kaldi dev_spk.list selection (protocol), and
        # other non-core speakers are excluded
        import shutil

        from qasr.data.timit import DEV_SPEAKERS, CORE_TEST_SPEAKERS

        assert not (DEV_SPEAKERS & CORE_TEST_SPEAKERS)
        src = os.path.join(fixture_corpus, "test", "dr1", "mzzz9")
        dst = os.path.join(fixture_corpus, "test", "dr1", "faks0")
        shutil.copytree(src, dst)
        try:
            dev = TimitDataset(fixture_corpus, "dev")
            speakers = {u.speaker for u in dev.utterances}
            assert speakers == {"faks0"}
        finally:
            shutil.rmtree(dst)

    def test_load_returns_ids(self, fixture_corpus):
        ds = TimitDataset(fixture_corpus, "train")
        wav, ids = ds.load(0)
        assert wav.dtype == np.float32 and np.abs(wav).max() <= 1.0
        assert list(ids) == [PHONE_TO_ID[p] for p in ["h#", "sh", "iy", "h#"]]

    def test_missing_root_raises_clearly(self):
        with pytest.raises(FileNotFoundError, match="synthetic"):
            TimitDataset("/nonexistent/timit", "train")


class TestFeaturePipeline:
    def test_streaming_matches_cached(self, fixture_corpus, tmp_path):
        """cache_features=False featurizes on demand; the length-aware delta
        chain makes valid-region features independent of batch padding, so
        cached and streaming modes must agree everywhere."""
        from qasr.data.pipeline import TimitFeaturePipeline

        cfg = get_config("timit_qcnn").override(
            **{"data.data_dir": fixture_corpus, "data.batch_size": 2}
        )
        cached = TimitFeaturePipeline(
            cfg, split="train", featurize_batch=2, cache_dir=str(tmp_path / "c")
        )
        streaming = TimitFeaturePipeline(
            cfg, split="train", featurize_batch=2,
            cache_dir=str(tmp_path / "s"), cache_features=False,
        )
        assert len(streaming) == len(cached)
        for i in range(len(cached)):
            a, b = cached[i], streaming[i]
            assert a.features.shape == b.features.shape
            np.testing.assert_array_equal(a.labels, b.labels)
            np.testing.assert_allclose(
                a.features, b.features, rtol=1e-4, atol=1e-4
            )

    def test_block_prefetch_matches_per_utterance(self, fixture_corpus, tmp_path):
        """Streaming block prefetch (one padded device dispatch per block)
        must produce the same features as the per-utterance path, and the
        batcher must actually drive it."""
        from qasr.data.batching import epoch_iterator
        from qasr.data.pipeline import TimitFeaturePipeline

        cfg = get_config("timit_qcnn").override(
            **{"data.data_dir": fixture_corpus, "data.batch_size": 2,
               "data.bucket_sizes": "512"}
        )
        streaming = TimitFeaturePipeline(
            cfg, split="train", featurize_batch=2,
            cache_dir=str(tmp_path / "p"), cache_features=False,
        )
        n = len(streaming)
        # per-utterance ground truth
        plain = [streaming._featurize_one(i) for i in range(n)]
        # block path
        streaming.prefetch(range(n))
        assert len(streaming._stream_cache) == n
        for i in range(n):
            got = streaming[i]  # pops from the block cache
            np.testing.assert_array_equal(got.labels, plain[i].labels)
            np.testing.assert_allclose(
                got.features, plain[i].features, rtol=1e-4, atol=1e-4
            )
        assert not streaming._stream_cache  # popped on access (bounded)

        # the batcher announces the epoch order: prefetch gets called and
        # batches come out identical to the unprefetched stream
        calls = []
        real = streaming.prefetch

        def spy(idxs):
            calls.append(list(idxs))
            real(idxs)

        streaming.prefetch = spy
        batches = list(epoch_iterator(streaming, cfg.data, train=True, seed=3))
        assert calls and sum(len(c) for c in calls) >= n
        assert batches

    def test_end_to_end(self, fixture_corpus):
        cfg = get_config("timit_qcnn").override(
            **{"data.data_dir": fixture_corpus, "data.batch_size": 2}
        )
        pipe_cls = __import__(
            "qasr.data.pipeline", fromlist=["TimitFeaturePipeline"]
        ).TimitFeaturePipeline
        pipe = pipe_cls(cfg, split="train", featurize_batch=2)
        assert len(pipe) == 3
        ex = pipe[0]
        # 12000 samples, 400/160 framing -> 73 frames
        assert ex.features.shape == (73, 40, 4)
        assert np.isfinite(ex.features).all()
        assert ex.num_labels == 4
        # normalized: near-zero mean per channel over valid frames
        assert abs(ex.features.mean()) < 0.1
        # cache hit on second construction
        pipe2 = pipe_cls(cfg, split="train", featurize_batch=2)
        np.testing.assert_allclose(pipe2[0].features, ex.features)

    def test_feeds_training_batcher(self, fixture_corpus):
        from qasr.data.batching import epoch_iterator

        cfg = get_config("timit_qcnn").override(
            **{"data.data_dir": fixture_corpus, "data.batch_size": 2}
        )
        pipe_cls = __import__(
            "qasr.data.pipeline", fromlist=["TimitFeaturePipeline"]
        ).TimitFeaturePipeline
        pipe = pipe_cls(cfg, split="train")
        batch = next(iter(epoch_iterator(pipe, cfg.data, train=False)))
        assert batch["features"].shape[0] == 2
        assert batch["features"].shape[2:] == (40, 4)
        assert (batch["label_lengths"] == 4).all()


class TestLibriSpeech:
    @pytest.fixture()
    def libri_corpus(self, tmp_path):
        rng = np.random.RandomState(7)
        d = tmp_path / "train-clean-100" / "19" / "198"
        d.mkdir(parents=True)
        with open(d / "19-198.trans.txt", "w") as f:
            for i, text in enumerate(["HELLO WORLD", "IT'S A TEST"]):
                utt = f"19-198-{i:04d}"
                wav = (rng.randn(9000) * 3000).astype(np.int16)
                write_riff(str(d / f"{utt}.wav"), wav)
                f.write(f"{utt} {text}\n")
        return str(tmp_path)

    def test_char_vocab_roundtrip(self):
        from qasr.data.librispeech import ids_to_text, text_to_ids, VOCAB_SIZE

        ids = text_to_ids("It's a test!")
        assert ids_to_text(ids) == "IT'S A TEST"  # '!' dropped
        assert VOCAB_SIZE == 29
        assert ids.min() >= 1

    def test_dataset_and_pipeline(self, libri_corpus):
        from qasr.data.librispeech import LibriSpeechDataset
        from qasr.data.pipeline import LibriFeaturePipeline
        from qasr.configs import get_config

        ds = LibriSpeechDataset(libri_corpus, "train-clean-100")
        assert len(ds) == 2
        wav, ids = ds.load(0)
        assert len(ids) == len("HELLO WORLD")

        cfg = get_config("librispeech_qlstm").override(
            **{"data.data_dir": libri_corpus}
        )
        pipe = LibriFeaturePipeline(cfg, split="train-clean-100", featurize_batch=2)
        assert len(pipe) == 2
        assert pipe[0].features.shape[1:] == (40, 4)

    def test_missing_root(self):
        from qasr.data.librispeech import LibriSpeechDataset

        with pytest.raises(FileNotFoundError, match="synthetic"):
            LibriSpeechDataset("/nonexistent", "train-clean-100")
