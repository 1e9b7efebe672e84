"""AU Agent: objective facial-muscle descriptions from OpenFace Action
Units via a LoRA-tuned Qwen decoder.

Capability-parity with the reference AUAgent (reference:
my_affectgpt/models/au_agent.py:14-252): parse OpenFace `AU??_r`
intensity columns, keep AUs > 0.5, map AU ids to FACS names, build a
Qwen chat-template prompt, and generate a non-emotional movement
description. The HF generate call is replaced by this framework's
compiled batched decode; the LoRA adapter rides the same fused-LoRA path
as the main model (rank 64 / α 128 per the reference SFT recipe,
au_agent_finetune/train_au_agent.sh:79-110).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

AU_NAME_MAP = {
    "AU01": "Inner brow raiser",
    "AU02": "Outer brow raiser",
    "AU04": "Brow lowerer",
    "AU05": "Upper lid raiser",
    "AU06": "Cheek raiser",
    "AU07": "Lid tightener",
    "AU09": "Nose wrinkler",
    "AU10": "Upper lip raiser",
    "AU12": "Lip corner puller (smile)",
    "AU14": "Dimpler",
    "AU15": "Lip corner depressor",
    "AU17": "Chin raiser",
    "AU20": "Lip stretcher",
    "AU23": "Lip tightener",
    "AU25": "Lips part",
    "AU26": "Jaw drop",
    "AU45": "Blink",
}

INSTRUCTION = (
    "Generate a detailed and objective facial muscle movement description "
    "based on the Action Unit detections. Focus only on the physical "
    "movements without inferring emotions."
)


def parse_openface_row(csv_row: Dict) -> Dict[str, float]:
    """OpenFace CSV row → {AU01: intensity, ...} from `*_r` columns."""
    au_values = {}
    for key, value in csv_row.items():
        key = str(key).strip()
        if key.endswith("_r"):
            try:
                au_values[key[:-2]] = float(value)
            except (TypeError, ValueError):
                continue
    return au_values


def build_au_input(
    au_values: Dict[str, float],
    au_description: Optional[str] = None,
    threshold: float = 0.5,
) -> Optional[str]:
    """Filter significant AUs and format the user-turn text; None signals a
    neutral face (the reference returns a fixed string then)."""
    significant = {
        k.replace("_r", ""): v for k, v in au_values.items() if v > threshold
    }
    if not significant:
        return None
    au_values_text = ", ".join(f"{au}: {v:.2f}" for au, v in significant.items())
    if au_description:
        au_descriptions_text = au_description
    else:
        au_descriptions_text = ", ".join(
            f"{AU_NAME_MAP.get(au, au)} (intensity: {v:.2f})"
            for au, v in significant.items()
        )
    return f"AU values: {au_values_text}\nAU descriptions: {au_descriptions_text}"


def build_chat_prompt(user_text: str) -> str:
    """Qwen2.5 chat template (system + user + generation prompt)."""
    return (
        f"<|im_start|>system\n{INSTRUCTION}<|im_end|>\n"
        f"<|im_start|>user\n{user_text}<|im_end|>\n"
        f"<|im_start|>assistant\n"
    )


NEUTRAL_DESCRIPTION = "neutral expression with minimal facial movement"


@dataclass
class AUAgent:
    """Batched AU→description generation over the compiled decode path."""

    frozen_llm: dict
    llm_cfg: "object"
    tokenizer: "object"
    lora: Optional[dict] = None
    max_new_tokens: int = 256
    temperature: float = 0.7
    top_p: float = 0.9
    # the reference AU agent generates with repetition_penalty=1.1
    # (my_affectgpt/models/au_agent.py:191) — HF-processor-exact here
    repetition_penalty: float = 1.1

    def generate_descriptions(
        self,
        batch_au_values: List[Dict[str, float]],
        au_descriptions: Optional[List[Optional[str]]] = None,
        rng=None,
    ) -> List[str]:
        import jax
        import jax.numpy as jnp

        from affectgpt_tpu.inference import generate as gen
        from affectgpt_tpu.models import qwen2

        prompts, positions = [], []
        outputs: List[Optional[str]] = [None] * len(batch_au_values)
        for i, au_values in enumerate(batch_au_values):
            desc = au_descriptions[i] if au_descriptions else None
            user_text = build_au_input(au_values, desc)
            if user_text is None:
                outputs[i] = NEUTRAL_DESCRIPTION
            else:
                prompts.append(build_chat_prompt(user_text))
                positions.append(i)

        if prompts:
            from affectgpt_tpu.tokenization import encode_batch

            ids, lengths = encode_batch(self.tokenizer, prompts)
            t_pad = ids.shape[1]
            gcfg = gen.GenerateConfig(
                max_new_tokens=self.max_new_tokens, do_sample=True,
                temperature=self.temperature, top_p=self.top_p,
                eos_token_id=self.tokenizer.eos_token_id,
                repetition_penalty=self.repetition_penalty,
            )
            ids_dev = jnp.asarray(ids)
            embeds = qwen2.embed_tokens(self.frozen_llm, ids_dev)
            tokens, num_valid = gen.generate(
                self.frozen_llm, self.llm_cfg, gcfg, embeds, jnp.asarray(lengths),
                rng if rng is not None else jax.random.PRNGKey(0),
                max_len=t_pad + self.max_new_tokens, lora=self.lora,
                prompt_ids=ids_dev,
            )
            for pos, row, nv in zip(positions, np.asarray(tokens), np.asarray(num_valid)):
                text = self.tokenizer.decode(row[: int(nv)], skip_special_tokens=True)
                text = gen.trim_output_text(text)
                if "Description:" in text:
                    text = text.split("Description:")[-1].strip()
                outputs[pos] = text
        return [o if o is not None else NEUTRAL_DESCRIPTION for o in outputs]

    def generate_description(self, au_values: Dict[str, float], au_description=None) -> str:
        return self.generate_descriptions([au_values], [au_description])[0]
