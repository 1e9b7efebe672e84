"""AU-agent LoRA SFT CLI (au_agent_finetune/train_au_agent.py): end-to-end
smoke at tiny geometry, including the reference's lora_dropout 0.05
default (reference au_agent_finetune/train_au_agent.sh:91,
au_agent_lora_config.yaml:12)."""

import json
import sys

import pytest


RECORDS = [
    {"user": "AU06 cheek raiser, AU12 lip corner puller",
     "assistant": "The person shows a genuine smile."},
    {"user": "AU04 brow lowerer",
     "assistant": "The person appears to frown."},
    {"user": "AU01 inner brow raiser, AU15 lip corner depressor",
     "assistant": "The person looks sad."},
    {"user": "AU05 upper lid raiser, AU26 jaw drop",
     "assistant": "The person appears surprised."},
]


@pytest.mark.parametrize("dropout", ["0.05", "0"])
def test_train_au_agent_cli(tmp_path, monkeypatch, dropout):
    data = tmp_path / "au_sft.json"
    data.write_text(json.dumps(RECORDS))
    out = tmp_path / f"au_agent_{dropout}"

    monkeypatch.setattr(sys, "argv", [
        "train_au_agent.py", "--data", str(data),
        "--llama-model", "tiny", "--lora-r", "2", "--lora-alpha", "4",
        "--lora-dropout", dropout, "--epochs", "1", "--batch-size", "2",
        "--max-length", "64", "--output-dir", str(out), "--seed", "0",
    ])
    sys.path.insert(0, "/root/repo")
    from au_agent_finetune import train_au_agent

    train_au_agent.main()
    ckpts = list(out.glob("checkpoint_*"))
    assert ckpts, "AU SFT produced no checkpoint"
