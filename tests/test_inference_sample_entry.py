"""inference_sample.py end-to-end: real WAV file → device resample/clip →
tiny HuBERT → merger → splice → decode → printed description."""

import sys

import numpy as np
import pytest

from tests.synth_corpus import write_wav


def test_inference_sample_audio_only(tmp_path, monkeypatch, capsys):
    wav_path = tmp_path / "clip.wav"
    t = np.arange(int(22050 * 2.5)) / 22050
    write_wav(wav_path, (0.3 * np.sin(2 * np.pi * 200 * t)).astype(np.float32), rate=22050)

    monkeypatch.setattr(
        sys, "argv",
        ["inference_sample.py", "--audio_path", str(wav_path),
         "--outside_face_or_frame", "audioonly",
         "--outside_user_message", "How do they feel?",
         "--max_new_tokens", "8"],
    )
    sys.path.insert(0, "/root/repo")
    import inference_sample as entry

    entry.main()
    out = capsys.readouterr().out.strip()
    assert isinstance(out, str)  # decoded (random-weight) response printed
