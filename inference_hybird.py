"""Batch inference over the MER-UniBench evaluation datasets.

API parity with the reference driver (reference:
AffectGPT/inference_hybird.py:132-343): checkpoint-root auto-discovery
(most checkpoints wins), epoch selection, per-dataset loop with
per-modality preextract switches, `{save_root}/{epoch}.npz` results
holding name2reason, skip-if-exists resume.

TPU redesign: clips are decoded in *batches* through one compiled
prefill+decode program (the reference generates batch-1), which is the
main throughput lever (BASELINE.md north star).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from affectgpt_tpu import registry
from affectgpt_tpu.bootstrap import build_model
from affectgpt_tpu.config import Config
from affectgpt_tpu.data import qa
from affectgpt_tpu.data.base_dataset import DatasetConfig, ModelDataConfig
from affectgpt_tpu.data.datasets import get_dataset_class  # noqa: F401 (registry import)
from affectgpt_tpu.inference.chat import Chat, encode_media_features
from affectgpt_tpu.training import checkpoint
from affectgpt_tpu.utils.logging import logger, setup_logger

MERBENCH_DATASETS = (
    "MER2023", "MER2024", "MELD", "IEMOCAPFour",
    "CMUMOSI", "CMUMOSEI", "SIMS", "SIMSv2", "OVMERDPlus",
)


def parse_args():
    parser = argparse.ArgumentParser(description="AffectGPT-TPU batch inference")
    parser.add_argument("--cfg-path", default=None)
    parser.add_argument("--options", nargs="+")
    parser.add_argument("--dataset", default="merbench")
    parser.add_argument("--zeroshot", action="store_true", default=False)
    parser.add_argument("--no_reasoning", action="store_true", default=False)
    parser.add_argument("--outside_user_message", default=None)
    parser.add_argument("--outside_face_or_frame", default=None)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--max_new_tokens", type=int, default=300)
    parser.add_argument("--ckpt_root", default=None,
                        help="run dir holding checkpoint_*; defaults to auto-discovery "
                             "under output/<cfg-name> (most checkpoints wins)")
    parser.add_argument("--epochs", default="last",
                        help="'last', 'all', a single epoch number, or 'a-b' range")
    parser.add_argument("--int8", action="store_true",
                        help="int8 serving mode (quantized decoder weights)")
    parser.add_argument("--int4", action="store_true",
                        help="int4 serving mode (group-128 quantized decoder "
                             "weights; halves the decode HBM read again vs "
                             "int8 — the 7B-flagship-on-one-chip path)")
    parser.add_argument("--fuse_qkv", action="store_true",
                        help="concatenate qkv and gate/up into single serving "
                             "matmuls (single-chip dense engine only). Wins at "
                             "moderate batch (7B int8 b256: 59→64 clips/s) but "
                             "its bigger prefill dequant transients shrink the "
                             "max-batch envelope — the unfused layout peaks "
                             "higher (69.8 @ b352); off by default")
    parser.add_argument("--no_merge_lora", action="store_true",
                        help="keep LoRA adapters as a parallel branch instead "
                             "of folding them into the serving weights (merge "
                             "is the default: skips ~2 adapter matmuls per "
                             "projection per decode step, and quantization "
                             "sees the adapted weights)")
    parser.add_argument("--paged", action="store_true",
                        help="serve through the paged-KV continuous-batching engine "
                             "(top-p sampling; HBM bounded by tokens in flight)")
    parser.add_argument("--paged_block_size", type=int, default=16)
    parser.add_argument("--paged_num_blocks", type=int, default=2048)
    parser.add_argument("--fuse_mode", choices=["full", "qkv"], default="full",
                        help="with --fuse_qkv: concat qkv+gateup (full) or "
                             "qkv only (smaller prefill dequant transient)")
    parser.add_argument("--paged_slots", type=int, default=16,
                        help="concurrent sequences in the continuous-batching "
                             "engine (decode batch is padded to this)")
    parser.add_argument("--paged_prefill_chunk", type=int, default=0,
                        help="chunked prefill: cap each admission at N prompt "
                             "tokens so in-flight decodes stall at most one "
                             "chunk between bursts (0 = off)")
    parser.add_argument("--paged_admission", choices=["reserve", "optimistic"],
                        default="reserve",
                        help="reserve: admission claims a request's full-"
                             "lifetime block budget (decode can never starve). "
                             "optimistic: prompt blocks only, with recompute "
                             "preemption of the youngest slot when a decode "
                             "burst would drain the pool — higher occupancy "
                             "on undersized pools")
    parser.add_argument("--greedy", action="store_true", default=False,
                        help="greedy decoding (reproducible quality runs; "
                        "default is the reference's top-p 0.9 sampling)")
    parser.add_argument("--speculative", type=int, default=0, metavar="D",
                        help="EXPERIMENTAL: on this stack the verify step costs "
                             "~2.8x a plain decode step, so even ~full draft "
                             "acceptance only reaches ~1.11x (0.37x floor) — "
                             "measured envelope in scripts/bench_speculative.py. "
                             "prompt-lookup speculative decoding with D draft "
                             "tokens per verify step (greedy-exact — same "
                             "tokens, fewer weight sweeps on decode-heavy "
                             "reasoning outputs). Requires --greedy; dense "
                             "engine only")
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel degree: shard the LLM over the "
                        "first N devices of a 1×N mesh (single-program GSPMD "
                        "serving; the 7B flagship path on multi-chip slices)")
    return parser.parse_args()


def select_epochs(ckpts, spec: str):
    """[(epoch, path)] filtered by 'last' | 'all' | 'N' | 'A-B'
    (reference epoch selection, inference_hybird.py:60-83)."""
    if not ckpts:
        return []
    if spec == "last":
        return [ckpts[-1]]
    if spec == "all":
        return ckpts
    if "-" in spec:
        lo, hi = (int(s) for s in spec.split("-"))
        return [(e, p) for e, p in ckpts if lo <= e <= hi]
    want = int(spec)
    return [(e, p) for e, p in ckpts if e == want]


def get_user_message(zeroshot: bool, outside: str | None, use_reasoning: bool) -> str:
    """Priority: outside > zeroshot(ovlabel) > reasoning(description)
    (reference inference_hybird.py:116-129)."""
    if outside is not None:
        return outside
    if zeroshot:
        return "Please recognize all possible emotional states of the character."
    return "Please infer the person's emotional state and provide your reasoning process."


def main() -> None:
    args = parse_args()
    setup_logger()
    cfg = Config.from_file(args.cfg_path, args.options) if args.cfg_path else Config.from_dict({})

    model_cfg, frozen, trainable, tokenizer = build_model(cfg, with_encoders=True)
    assert not (args.int8 and args.int4), "--int8 and --int4 are exclusive"
    quant_bits = 4 if args.int4 else (8 if args.int8 else None)
    merge = not args.no_merge_lora
    if quant_bits and not merge:
        from affectgpt_tpu.models import qwen2

        frozen = dict(frozen)
        frozen["llm"] = qwen2.quantize_params(frozen["llm"], bits=quant_bits)
    mesh = None
    if args.tp > 1:
        from affectgpt_tpu.parallel import mesh as mesh_lib

        devices = jax.devices()
        assert len(devices) >= args.tp, (
            f"--tp {args.tp} needs {args.tp} devices, found {len(devices)}"
        )
        mesh = mesh_lib.create_mesh(devices[: args.tp], tp=args.tp)
        if not merge:
            frozen = mesh_lib.shard_params(mesh, frozen)
    inference_cfg = cfg.inference

    datasets = (
        MERBENCH_DATASETS if args.dataset == "merbench" else [args.dataset]
    )
    face_or_frame = args.outside_face_or_frame or inference_cfg.get(
        "face_or_frame", cfg.model.get("face_or_frame", "frame")
    )
    user_message = get_user_message(
        args.zeroshot, args.outside_user_message, not args.no_reasoning
    )

    result_root = os.path.join("output", "results", cfg.name)

    # checkpoint-epoch loop: auto-discover the run dir with the most
    # checkpoints (reference inference_hybird.py:32-54), select epochs.
    ckpt_root = args.ckpt_root or checkpoint.discover_checkpoint_root(cfg.output_dir)
    epochs = select_epochs(
        checkpoint.list_checkpoints(ckpt_root) if ckpt_root else [], args.epochs
    ) or [(0, None)]  # zero-shot (no checkpoints): single pass with init weights

    data_model_cfg = ModelDataConfig(
        num_video_query_token=model_cfg.num_video_query_token,
        num_audio_query_token=model_cfg.num_audio_query_token,
        num_multi_query_token=model_cfg.num_multi_query_token,
        num_image_query_token=model_cfg.num_image_query_token,
        au_fusion_type=model_cfg.au_fusion_type,
    )

    if args.fuse_qkv and not merge:
        print("WARNING: --fuse_qkv ignored with --no_merge_lora (fusion only "
              "applies to the merged serving weights)", flush=True)

    for epoch, ckpt_path in epochs:
        epoch_trainable = (
            checkpoint.apply_checkpoint_overlays(trainable, ckpt_path)
            if ckpt_path else trainable
        )
        serve_frozen = frozen
        if merge:
            # fold this epoch's LoRA into the serving weights (then quantize
            # the adapted weights) — decode skips the adapter matmuls
            from affectgpt_tpu.models import qwen2

            llm = serve_frozen["llm"]
            if epoch_trainable.get("lora") is not None:
                llm = qwen2.merge_lora(llm, epoch_trainable["lora"], model_cfg.llm)
                epoch_trainable = {**epoch_trainable, "lora": None}
            if args.fuse_qkv and (mesh is not None or args.paged):
                print("WARNING: --fuse_qkv ignored (tp>1 and the paged engine "
                      "keep the split weight layout)", flush=True)
            if args.fuse_qkv and mesh is None and not args.paged:
                # single-chip dense engine: concat qkv and gate/up (3 fewer
                # ops per layer per decode step; tp shards and the paged
                # engine keep the split layout). --fuse_mode qkv keeps
                # gate/up split — 8× smaller prefill dequant transient
                llm = qwen2.fuse_qkv_gateup(
                    llm, model_cfg.llm, fuse_gateup=args.fuse_mode == "full"
                )
            if quant_bits:
                llm = qwen2.quantize_params(llm, bits=quant_bits)
            serve_frozen = {**serve_frozen, "llm": llm}
        if mesh is not None:
            from affectgpt_tpu.parallel import mesh as mesh_lib

            epoch_trainable = mesh_lib.shard_params(mesh, epoch_trainable)
            if merge:
                serve_frozen = mesh_lib.shard_params(mesh, serve_frozen)
        if args.speculative:
            assert args.greedy, "--speculative is greedy-exact; add --greedy"
            assert not args.paged, "--speculative runs on the dense engine"
            print("WARNING: --speculative is EXPERIMENTAL on TPU: the verify "
                  "step costs ~2.8x a plain decode step; break-even needs "
                  ">~90% draft acceptance (measured: 1.11x ceiling, 0.37x "
                  "floor — scripts/bench_speculative.py)", flush=True)
        chat = Chat(serve_frozen, epoch_trainable, model_cfg, tokenizer,
                    kv_cache_dtype=inference_cfg.get("kv_cache_dtype"),
                    mesh=mesh,
                    speculative_draft_len=args.speculative
                    or int(inference_cfg.get("speculative_draft_len", 0) or 0))
        run_datasets(
            args, cfg, chat, frozen, model_cfg, tokenizer, datasets, face_or_frame,
            user_message, result_root, str(epoch), data_model_cfg,
        )


def make_paged_server(args, chat, max_prompt_tokens: int):
    """ONE long-lived continuous-batching engine for a whole dataset pass:
    requests stream in as chunks load and admission happens whenever slots
    free up, so prefill/decode overlap ACROSS chunks (vLLM-style serving;
    the engine itself is affectgpt_tpu.inference.paged)."""
    from affectgpt_tpu.inference.paged import PagedBatchServer, PagedConfig

    import jax.numpy as jnp

    max_tokens = max_prompt_tokens + args.max_new_tokens
    pcfg = PagedConfig(
        block_size=args.paged_block_size,
        num_blocks=args.paged_num_blocks,
        max_blocks_per_seq=-(-max_tokens // args.paged_block_size),
    )
    pool_dtype = (
        jnp.int8 if chat.kv_cache_dtype == "int8"
        else chat.frozen["llm"]["embed_tokens"]["table"].dtype
    )
    return PagedBatchServer(
        chat.frozen, chat.trainable, chat.cfg, chat.tokenizer,
        pcfg=pcfg, max_slots=args.paged_slots,
        dtype=pool_dtype,
        do_sample=not args.greedy, top_p=0.9, seed=0, mesh=chat.mesh,
        admission=args.paged_admission,
        prefill_chunk_tokens=args.paged_prefill_chunk or None,
    )


def submit_chunk_paged(server, chat, face_or_frame, subtitles, user_message,
                       stacked, first_rid: int, max_new_tokens: int):
    """Tokenize one loaded chunk and stream its requests into the engine."""
    from affectgpt_tpu.inference.server import Request

    ids, lengths, offsets = chat.build_prompt_batch(
        face_or_frame, subtitles, user_message
    )
    for i in range(len(subtitles)):
        server.submit(Request(
            request_id=first_rid + i,
            input_ids=np.asarray(ids[i][: lengths[i]], np.int32),
            features={m: np.asarray(v[i]) for m, v in stacked.items()},
            offsets={m: int(o[i]) for m, o in offsets.items()},
            max_new_tokens=max_new_tokens,
        ))


def run_datasets(args, cfg, chat, frozen, model_cfg, tokenizer, datasets,
                 face_or_frame, user_message, result_root, epoch_tag, data_model_cfg):
    for ds_name in datasets:
        node = dict(cfg.datasets.get(ds_name.lower(), {}) or {})
        node.setdefault("face_or_frame", face_or_frame)
        if node.get("use_au_clip_realtime"):
            # AU features never reach the LLM input (no AU patch token in
            # either framework; the reference driver passes AU as Nonverbal
            # text only, inference_hybird.py:304), so per-sample CLIP text
            # encodes here would buy nothing — skip them. The knob still
            # drives the precompute CLI and direct load_modalities users.
            logger.info(
                "%s: use_au_clip_realtime disabled for batch inference "
                "(AU reaches the prompt via nonverbal text)", ds_name,
            )
            node["use_au_clip_realtime"] = False
        ds_cfg = DatasetConfig.from_cfg(node)
        dataset = registry.get("dataset", ds_name)(tokenizer, ds_cfg, data_model_cfg)

        save_root = os.path.join(result_root, f"result-{ds_name.lower()}")
        os.makedirs(save_root, exist_ok=True)
        save_path = os.path.join(save_root, f"{epoch_tag}.npz")
        if os.path.exists(save_path):  # epoch-level resume (reference :276-281)
            logger.info("skip %s (exists)", save_path)
            continue

        test_names = dataset.read_test_names()
        name2sub = getattr(dataset, "name2subtitle", {})
        name2reason = {}
        bs = args.batch_size

        def load_chunk(chunk):
            """Host-side modality IO for one chunk (runs in the prefetch
            thread; device work stays on the main thread)."""
            feats_per_name, subtitles = [], []
            for name in chunk:
                feats_per_name.append(dataset.load_modalities({"name": name}))
                subtitles.append(name2sub.get(name, ""))
            return feats_per_name, subtitles

        chunks = [test_names[s : s + bs] for s in range(0, len(test_names), bs)]
        # double-buffer: chunk k+1's npy/media reads overlap chunk k's decode
        import concurrent.futures

        pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        pending = pool.submit(load_chunk, chunks[0]) if chunks else None
        paged_server = None
        rid2name = {}
        for ci, chunk in enumerate(chunks):
            start = ci * bs
            feats_per_name, subtitles = pending.result()
            pending = (
                pool.submit(load_chunk, chunks[ci + 1]) if ci + 1 < len(chunks) else None
            )
            # stack features (preextracted) or encode raw media on device.
            # "au" is intentionally NOT stacked: AU features are vestigial
            # at the LLM input in the reference too — its splice list has
            # no AU patch token (affectgpt.py:969-1009) and its driver
            # passes AU as Nonverbal TEXT only ("img_list no longer
            # contains AU", reference inference_hybird.py:304) — so feeding
            # them would only pay a dead au-merger forward per batch.
            stacked: dict = {}
            for m in ("frame", "face", "audio"):
                pre = [p["features"].get(m) for p in feats_per_name]
                if all(f is not None for f in pre):
                    stacked[m] = jnp.asarray(np.stack(pre))
                    continue
                raws = [p["raw"].get(m) for p in feats_per_name]
                if all(r is not None for r in raws):
                    enc = encode_media_features(
                        frozen, model_cfg, {m: jnp.asarray(np.stack(raws))}
                    )
                    stacked.update(enc)
            if args.paged:
                # continuous batching: one engine for the whole dataset;
                # submit this chunk's requests and pump the engine only while
                # its backlog exceeds the slot count — admission proceeds
                # whenever slots free, overlapping requests across chunks
                if paged_server is None:
                    paged_server = make_paged_server(
                        args, chat, max_prompt_tokens=chat.max_len
                    )
                for i, name in enumerate(chunk):
                    rid2name[start + i] = name
                submit_chunk_paged(
                    paged_server, chat, face_or_frame, subtitles, user_message,
                    stacked, first_rid=start, max_new_tokens=args.max_new_tokens,
                )
                while len(paged_server.pending) > paged_server.max_slots:
                    paged_server.step()
                logger.info(
                    "%s: %d/%d submitted (%d done, %d in flight)",
                    ds_name, start + len(chunk), len(test_names),
                    len(paged_server.results),
                    sum(s is not None for s in paged_server.slots),
                )
            else:
                responses = chat.answer_batch(
                    face_or_frame, subtitles, user_message, stacked,
                    rng=jax.random.PRNGKey(start), max_new_tokens=args.max_new_tokens,
                    do_sample=not args.greedy,
                )
                for name, response in zip(chunk, responses):
                    name2reason[name] = response
                logger.info("%s: %d/%d clips", ds_name, start + len(chunk), len(test_names))
        if args.paged and paged_server is not None:
            from affectgpt_tpu.inference.generate import trim_output_text

            results = paged_server.run_until_drained()
            for rid, tokens in results.items():
                name2reason[rid2name[rid]] = trim_output_text(
                    tokenizer.decode(tokens, skip_special_tokens=True)
                )
            logger.info("paged engine stats: %s", paged_server.stats)
            logger.info("paged request SLAs: %s", paged_server.clock.summary())
        pool.shutdown(wait=False)

        np.savez_compressed(save_path, name2reason=name2reason)
        logger.info("saved %s (%d clips)", save_path, len(name2reason))


if __name__ == "__main__":
    main()
