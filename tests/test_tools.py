"""The corpus generator tools must produce directories the real readers index
(they are the container's only full-pipeline demo data; docs/end_to_end.md)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *args):
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", script), *args],
        check=True,
        cwd=REPO,
        timeout=300,
    )


def test_mini_timit_generator_feeds_reader(tmp_path):
    out = str(tmp_path / "timit")
    _run(
        "make_mini_timit.py", "--out", out,
        "--train-speakers", "2", "--utts-per-speaker", "2",
        "--dev-speakers", "1", "--test-speakers", "1",
    )
    from qasr.data.timit import PHONE_TO_ID, TimitDataset

    max_id = max(PHONE_TO_ID.values())
    for split, expect in (("train", 4), ("dev", 2), ("core_test", 2)):
        ds = TimitDataset(out, split)
        assert len(ds) == expect
        wav, ids = ds.load(0)
        assert wav.ndim == 1 and len(wav) > 0
        assert len(ids) >= 2 and ids.max() <= max_id


def test_mini_librispeech_generator_feeds_reader(tmp_path):
    out = str(tmp_path / "libri")
    _run(
        "make_mini_librispeech.py", "--out", out,
        "--speakers", "2", "--utts-per-speaker", "2", "--dev-speakers", "1",
    )
    from qasr.data.librispeech import VOCAB_SIZE, LibriSpeechDataset, ids_to_text

    for split, expect in (("train-clean-100", 4), ("dev-clean", 2)):
        ds = LibriSpeechDataset(out, split)
        assert len(ds) == expect
        wav, ids = ds.load(0)
        assert len(wav) > 0 and ids.max() < VOCAB_SIZE
        assert " " not in ids_to_text(ids).strip()[:1]  # non-empty transcript
