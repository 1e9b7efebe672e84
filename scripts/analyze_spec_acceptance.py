"""Offline prompt-lookup acceptance on REAL templated description outputs
(VERDICT r3 item 5).

The speculative decoder (inference/generate.py generate_speculative) drafts
via tiered prompt-lookup: the continuation of the most recent earlier
2-gram (else 1-gram) match of the stream head. Its value depends entirely
on the ACCEPTANCE the real description workload achieves — and that is a
property of the TOKEN STREAM, not the model: replaying a real output
through the draft rule counts exactly the tokens a greedy target emitting
that stream would accept.

Ground truth streams: the reference repo's own 7B description dumps
(/root/reference/OV-MER/output/results-ovmerd/*/output-reason-7b-*.npz,
332 clips x 10 model/prompt variants, mean ~160 words — the "In the
text..."-era reasoning workload). Tokenization brackets the unknown BPE:
word-level splits (conservative: BPE pieces repeat at least as often as
whole words) and byte-level (optimistic).

Output: mean accepted drafts / tokens-per-verify-iteration per D, plus the
modeled decode-phase speedup at the TPU-measured verify cost
(verify iteration ≈ 2.8x a plain decode step on this stack, CLAUDE.md).

Run: python scripts/analyze_spec_acceptance.py  (CPU-only, no TPU).
"""

from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = "/root/reference/OV-MER/output/results-ovmerd"
# the reference's description-workload instruction (ovmer harness prompt)
PROMPT = (
    "Please infer the person's emotional state in the video, providing "
    "your reasoning from visual clues, acoustic clues and the subtitle. "
    "In the text, various clues may reveal its emotional state."
)
VERIFY_COST = 2.8  # measured: verify iteration vs plain decode step


def tokenize(text: str, mode: str):
    if mode == "word":
        return text.split()
    return list(text.encode("utf-8", errors="ignore"))


def simulate(prompt_toks, out_toks, d: int):
    """Replay the tiered 2-gram/1-gram most-recent-match prompt-lookup of
    generate_speculative over a known continuation; returns (iterations,
    emitted, accepted_total). Per-token position indices keep each lookup
    O(occurrences) instead of O(history)."""
    from collections import defaultdict

    hist = list(prompt_toks)
    positions = defaultdict(list)
    for i, tok in enumerate(hist):
        positions[tok].append(i)

    def push(tok):
        positions[tok].append(len(hist))
        hist.append(tok)

    n = len(out_toks)
    iters = 0
    accepted_total = 0
    # first new token comes from prefill, not a verify iteration
    push(out_toks[0])
    pos = 1
    while pos < n:
        iters += 1
        last = hist[-1]
        prev = hist[-2] if len(hist) >= 2 else None
        cur = len(hist)
        occ = positions[last]
        j = -1
        for i in reversed(occ):  # tier 1: 2-gram + full continuation
            if i <= cur - 2 - d and i >= 1 and hist[i - 1] == prev:
                j = i
                break
        if j < 0:  # tier 2: 1-gram + full continuation
            for i in reversed(occ):
                if i <= cur - 2 - d:
                    j = i
                    break
        if j < 0:  # tier 3: nearest 1-gram anywhere before the head
            for i in reversed(occ):
                if i <= cur - 2:
                    j = i
                    break
        draft = hist[j + 1 : j + 1 + d] if j >= 0 else []
        acc = 0
        while (
            acc < len(draft)
            and pos + acc < n
            and draft[acc] == out_toks[pos + acc]
        ):
            acc += 1
        accepted_total += acc
        emit = min(acc + 1, n - pos)
        for tok in out_toks[pos : pos + emit]:
            push(tok)
        pos += emit
    return iters, pos, accepted_total


def main():
    files = sorted(glob.glob(os.path.join(RESULTS, "*", "output-reason-7b-*eng.npz")))
    files = [f for f in files if "openset" not in f]
    streams = []
    for f in files:
        m = np.load(f, allow_pickle=True)["name2reason"].tolist()
        for text in m.values():
            text = str(text).strip()
            if len(text.split()) >= 30:
                streams.append(text)
    print(f"# streams: {len(streams)} from {len(files)} dumps")

    report = {}
    for mode in ("word", "byte"):
        for d in (2, 4, 8):
            tot_iters = tot_tokens = 0
            per_stream = []
            for text in streams:
                pt = tokenize(PROMPT, mode)
                ot = tokenize(text, mode)
                iters, emitted, _ = simulate(pt, ot, d)
                tot_iters += iters
                tot_tokens += emitted - 1  # first token free via prefill
                per_stream.append((emitted - 1) / max(iters, 1))
            tpi = tot_tokens / max(tot_iters, 1)
            speedup = tpi / VERIFY_COST
            report[f"{mode}_d{d}"] = {
                "tokens_per_iteration": round(tpi, 3),
                "mean_accepted": round(tpi - 1, 3),
                "p50_tpi": round(float(np.median(per_stream)), 3),
                "decode_speedup_at_2.8x_verify": round(speedup, 3),
            }
            print(
                f"{mode:5s} D={d}: tokens/iter={tpi:.3f} "
                f"(accept {tpi-1:.3f}) -> decode speedup x{speedup:.2f}"
            )
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
