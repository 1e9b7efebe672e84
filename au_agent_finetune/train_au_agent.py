"""LoRA SFT of the AU Agent on AU→description instruction data.

Capability-parity with the reference recipe (reference:
au_agent_finetune/train_au_agent.sh:79-110 + au_agent_lora_config.yaml:
Qwen2.5-7B, LoRA rank 64 / α 128, chat-template SFT) but trained inside
this framework: the same fused-LoRA Qwen decoder, the same compiled
dp-sharded train step, Orbax checkpoints — no external LLaMA-Factory.

Usage:
  python au_agent_finetune/train_au_agent.py --data au_instruction_dataset.json \
      [--lora-r 64 --epochs 3 --batch-size 8 --lr 1e-4]
"""

from __future__ import annotations

import argparse
import json
import random

import numpy as np

from affectgpt_tpu import constants
from affectgpt_tpu.models.au_agent import build_chat_prompt
from affectgpt_tpu.utils.logging import logger, setup_logger


def build_batch(tokenizer, records, max_length: int):
    ids = np.full((len(records), max_length), tokenizer.pad_token_id, np.int32)
    labels = np.full((len(records), max_length), constants.IGNORE_INDEX, np.int32)
    mask = np.zeros((len(records), max_length), np.float32)
    for i, rec in enumerate(records):
        prompt = build_chat_prompt(rec["user"])
        p_ids = [tokenizer.bos_token_id] + tokenizer.encode(prompt)
        t_ids = tokenizer.encode(rec["assistant"]) + [tokenizer.eos_token_id]
        seq = (p_ids + t_ids)[:max_length]
        ids[i, : len(seq)] = seq
        mask[i, : len(seq)] = 1.0
        t_start = min(len(p_ids), max_length)
        labels[i, t_start : len(seq)] = seq[t_start:]
    return ids, labels, mask


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", required=True)
    parser.add_argument("--lora-r", type=int, default=64)
    parser.add_argument("--lora-alpha", type=float, default=128.0)
    # reference recipe trains with lora_dropout 0.05
    # (au_agent_finetune/train_au_agent.sh:91, au_agent_lora_config.yaml:12)
    parser.add_argument("--lora-dropout", type=float, default=0.05)
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--max-length", type=int, default=512)
    parser.add_argument("--output-dir", default="output/au_agent")
    parser.add_argument("--seed", type=int, default=42)
    # registry model key — "tiny" exercises the full recipe at test geometry
    parser.add_argument("--llama-model", default="Qwen25")
    args = parser.parse_args()
    setup_logger()

    import jax
    import jax.numpy as jnp
    import optax

    from affectgpt_tpu.bootstrap import build_tokenizer
    from affectgpt_tpu.config import Config
    from affectgpt_tpu.models import qwen2
    from affectgpt_tpu.training import checkpoint, optim

    with open(args.data) as handle:
        records = json.load(handle)
    logger.info("loaded %d SFT records", len(records))

    tokenizer = build_tokenizer({"llama_model_name": args.llama_model})
    from affectgpt_tpu.bootstrap import build_model

    cfg_dict = {"model": {"llama_model": args.llama_model, "lora_r": args.lora_r}}
    model_cfg, frozen, _, tokenizer = build_model(Config.from_dict(cfg_dict))
    llm_cfg = qwen2.QwenConfig(
        **{**model_cfg.llm.__dict__, "lora_r": args.lora_r,
           "lora_alpha": args.lora_alpha, "lora_dropout": args.lora_dropout}
    )
    lora = qwen2.init_lora(jax.random.PRNGKey(args.seed), llm_cfg)

    steps_per_epoch = max(len(records) // args.batch_size, 1)
    schedule = optim.linear_warmup_cosine_lr(
        args.lr, args.lr / 10, warmup_steps=steps_per_epoch // 10,
        total_steps=args.epochs * steps_per_epoch,
    )
    tx = optim.make_optimizer(schedule, weight_decay=0.0, max_grad_norm=1.0)
    opt_state = tx.init(lora)

    import os as _os

    # rbg bits: threefry mask generation costs ~29% of a 3B train step on
    # one v5e (see training/train_step.py); same knob here
    _impl = _os.environ.get("AFFECTGPT_DROPOUT_PRNG", "rbg")
    # a dummy key still feeds the jit arg when dropout is off (the jitted
    # step ignores it via the drop_base closure gate)
    drop_base = jax.random.key(args.seed, impl=_impl) if args.lora_dropout > 0 else None
    dummy_key = jax.random.key(0, impl=_impl)

    @jax.jit
    def step(lora, opt_state, ids, labels, mask, dropout_rng):
        def loss_fn(lora):
            embeds = qwen2.embed_tokens(frozen["llm"], ids)
            logits, _ = qwen2.forward(
                frozen["llm"], llm_cfg, embeds, mask, lora=lora,
                dropout_rng=dropout_rng if drop_base is not None else None,
            )
            return qwen2.cross_entropy_loss(logits, labels)

        loss, grads = jax.value_and_grad(loss_fn)(lora)
        updates, opt_state = tx.update(grads, opt_state, lora)
        return optax.apply_updates(lora, updates), opt_state, loss

    rng = random.Random(args.seed)
    global_step = 0
    for epoch in range(args.epochs):
        rng.shuffle(records)
        for it in range(steps_per_epoch):
            chunk = records[it * args.batch_size : (it + 1) * args.batch_size]
            ids, labels, mask = build_batch(tokenizer, chunk, args.max_length)
            lora, opt_state, loss = step(
                lora, opt_state, jnp.asarray(ids), jnp.asarray(labels), jnp.asarray(mask),
                jax.random.fold_in(drop_base, global_step)
                if drop_base is not None else dummy_key,
            )
            global_step += 1
            if it % 20 == 0:
                logger.info("epoch %d it %d loss %.4f", epoch, it, float(loss))
        checkpoint.save_checkpoint(args.output_dir, epoch + 1, {"lora": lora})
    logger.info("AU agent LoRA saved under %s", args.output_dir)


if __name__ == "__main__":
    main()
