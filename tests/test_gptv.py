"""GPT-4V annotation engine: batching/resume, bisection on failure,
response parsing, batch validation, top-1 scoring."""

import os

import numpy as np
import pytest

from affectgpt_tpu.toolkit import gptv


def _make_images(tmp_path, n=7):
    paths = []
    for i in range(n):
        p = tmp_path / "src" / f"img{i}.jpg"
        p.parent.mkdir(exist_ok=True)
        p.write_bytes(b"\xff\xd8fake" + bytes([i]))
        paths.append(str(p))
    return paths


class FormatTransport:
    """Answers every batch in the reference 'name/result' contract."""

    def __init__(self, label="Happiness", fail_batches=()):
        self.label = label
        self.fail_batches = set(fail_batches)
        self.calls = 0

    def __call__(self, messages):
        self.calls += 1
        if self.calls in self.fail_batches:
            raise RuntimeError("simulated API error")
        content = messages[0]["content"]
        n_images = sum(1 for c in content if c.get("type") == "image_url")
        return "".join(
            f"{{'name': image-{i + 1}, 'result': ['{self.label}', 'Neutral']}}\n"
            for i in range(n_images)
        )


def test_annotate_resume_and_collect(tmp_path):
    paths = _make_images(tmp_path)
    transport = FormatTransport()
    save_root, order = str(tmp_path / "out"), str(tmp_path / "order.npz")
    gptv.annotate_images(transport, paths, save_root, order,
                         gptv.GPTV_EMOS["rafdb"], bsize=3)
    assert transport.calls == 3  # 7 images / 3 per batch
    names, preds = gptv.collect_batches(save_root)
    assert len(names) == 7 and all("Happiness" in p for p in preds)

    # resume: nothing re-annotated, same order
    gptv.annotate_images(transport, paths, save_root, order,
                         gptv.GPTV_EMOS["rafdb"], bsize=3)
    assert transport.calls == 3


def test_bisection_on_failure(tmp_path):
    paths = _make_images(tmp_path, n=6)
    transport = FormatTransport(fail_batches={1})  # first whole-batch call dies
    save_root, order = str(tmp_path / "out"), str(tmp_path / "order.npz")
    gptv.annotate_images(transport, paths, save_root, order,
                         gptv.GPTV_EMOS["sfew"], bsize=6, bisect_depth=2)
    # failed batch split into two segments, both annotated
    files = sorted(os.listdir(save_root))
    assert files == ["batch_1_segment_1.npz", "batch_1_segment_2.npz"]
    names, preds = gptv.collect_batches(save_root)
    assert len(names) == 6 == len(preds)


def test_bad_batch_removed(tmp_path):
    save_root = tmp_path / "out"
    save_root.mkdir()
    np.savez_compressed(save_root / "batch_1.npz",
                        gpt4v="{'name': 1, 'result': ['happy']}",
                        names=np.array(["a.jpg", "b.jpg"], dtype=object))
    names, preds = gptv.collect_batches(str(save_root), delete_bad=True)
    assert names == [] and not (save_root / "batch_1.npz").exists()


def test_score_top1(tmp_path):
    paths = _make_images(tmp_path, n=4)
    transport = FormatTransport(label="Sadness")
    save_root, order = str(tmp_path / "out"), str(tmp_path / "order.npz")
    gptv.annotate_images(transport, paths, save_root, order,
                         gptv.GPTV_EMOS["rafdb"], bsize=2)
    name2gt = {f"img{i}.jpg": ("Sadness" if i % 2 == 0 else "Anger") for i in range(4)}
    csv = tmp_path / "merged.csv"
    acc = gptv.score_top1(save_root, name2gt, str(csv))
    assert acc == 0.5 and csv.exists()
    import pandas as pd

    df = pd.read_csv(csv)
    assert set(df.columns) == {"name", "gt", "gpt4v"} and len(df) == 4
    assert df["gpt4v"].iloc[0].startswith("Sadness,")


def test_select_samples_and_vocab_table(tmp_path):
    paths = _make_images(tmp_path, n=3)
    csv = gptv.select_samples(
        [f"img{i}.jpg" for i in range(3)], ["happy", "sad", "happy"],
        image_src=lambda n: str(tmp_path / "src" / n),
        save_root=str(tmp_path / "sel"),
    )
    assert os.path.exists(csv)
    assert len(os.listdir(tmp_path / "sel" / "image")) == 3
    assert len(gptv.GPTV_EMOS) == 21  # every reference gptv dataset
    assert gptv.GPTV_EMOS["mer2023"] == ["worried", "happy", "neutral",
                                         "angry", "surprised", "sad"]
