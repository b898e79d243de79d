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


def test_timit_protocol_runner_requires_data_or_mini():
    # the acceptance runner must fail fast without a corpus
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_timit_protocol.py")],
        cwd=REPO, capture_output=True, timeout=120,
    )
    assert p.returncode != 0
    assert b"--data-dir" in p.stderr + p.stdout


def test_memory_envelope_point_on_cpu():
    # AOT memory accounting works on any backend; tiny preset, tiny point
    from tools.memory_envelope import measure_point

    from qasr.configs import get_config

    cfg = get_config("tiny_synthetic")
    r = measure_point(cfg, 2, 64, False)
    assert r["total_gb"] > 0
    r2 = measure_point(cfg, 2, 64, True)
    assert r2["total_gb"] > 0


def test_scaling_table_measure_shape():
    # one-device measurement path produces a finite step time
    import jax

    from tools.run_scaling_table import measure

    from qasr.configs import get_config

    cfg = get_config("tiny_synthetic")
    dt = measure(cfg, jax.devices()[:1], 2, 64, 8, 1, 3)
    assert dt > 0
