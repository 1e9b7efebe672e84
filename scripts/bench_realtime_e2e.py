"""Fully-REALTIME throughput WITH host media decode in the loop.

The reference's 13.7 clips/s realtime figure INCLUDES decord video decode
of 411 real clips (MER-UniBench/README.md:321); bench_realtime.py
measures the device compute path only (frames pre-staged in host
memory). This bench closes that gap: it measures sustained clips/s over
a real on-disk corpus — container demux, JPEG decode, face-crop reads,
WAV reads, host→device transfer, and the full device graph (CLIP-L ×2
streams + HuBERT-large + 3B decode) all in the measured window.

Corpus (phase 0, one-time, cached, EXCLUDED like the reference's
OpenFace/corpus prep): RT_E2E_CLIPS MJPEG-AVI clips at the 224² ingest
tier built from the reference demo mp4 (rolled 64-frame windows), plus
per-clip OpenFace-style face-crop .npy ([64, 112, 112, 3] uint8) and a
16 kHz PCM16 WAV.

Streaming (phase 1, measured): RT_E2E_WORKERS decode threads run the
media ladder per clip — MJPEG demux + cv2.imdecode of ONLY the 8
sampled frames (media._read_video_avi_cv2's rung), mmap'd face reads,
native WAV — and convert to the wire format; the main thread assembles
batches of RT_E2E_BATCH, uploads, and drives the SAME compiled graph as
bench_realtime.py, double-buffered so upload(k+1) overlaps compute(k).

Wire format (the pipeline's host→device contract, ops/image.py):
frames/faces ship as planar YUV420 uint8 (1.5 B/px — halves transfer vs
RGB; the axon relay measures ~44 MB/s, so upload is the e2e wall on
this tunneled chip) and audio ships as ONE int16 waveform per clip
(the 8 HuBERT windows are sliced on device — 2× less than shipping
overlapped windows). yuv420_to_rgb + the slicing run in-graph.

Run: python scripts/bench_realtime_e2e.py   (one TPU process at a time)
Env: RT_E2E_CLIPS (411), RT_E2E_BATCH (96), RT_E2E_WORKERS (2),
     RT_E2E_FRAMES (8), RT_E2E_NEW (32), RT_E2E_CORPUS (corpus dir),
     RT_E2E_TINY=1 CPU smoke mode, RT_E2E_RGB=1 ships uint8 RGB instead
     of YUV420 (transfer-format A/B).
"""

from __future__ import annotations

import json
import os
import queue
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_REALTIME_CLIPS_PER_SEC = 13.7  # incl. decord decode, 411 clips

N_CLIPS = int(os.environ.get("RT_E2E_CLIPS", 411))
BATCH = int(os.environ.get("RT_E2E_BATCH", 96))
WORKERS = int(os.environ.get("RT_E2E_WORKERS", 2))
FRAMES = int(os.environ.get("RT_E2E_FRAMES", 8))
NEW = int(os.environ.get("RT_E2E_NEW", 32))
TINY = bool(os.environ.get("RT_E2E_TINY"))
RGB_WIRE = os.environ.get("RT_E2E_RGB", "0") == "1"
WAV_SAMPLES = 3200 if TINY else 64000  # 4 s @ 16 kHz (windows sliced on device)
WIN = 1600 if TINY else 32000  # 2 s HuBERT windows (reference clip length)
FRAME_HW = 56 if TINY else 224  # ingest-tier frame resolution
FACE_HW = 28 if TINY else 112  # OpenFace-style crop resolution
CLIP_FRAMES = 16 if TINY else 64  # frames stored per corpus clip
DEMO_MP4 = "/root/reference/AffectGPT/demo/sample_00000000.mp4"
DEMO_WAV = "/root/reference/AffectGPT/demo/sample_00000000.wav"


# ---------------------------------------------------------------------------
# Phase 0: corpus build (one-time, cached, excluded from the measurement —
# the reference's face crops / corpus prep are likewise offline artifacts)


def build_corpus(root: str) -> list:
    from affectgpt_tpu.data import ingest, media

    os.makedirs(root, exist_ok=True)
    manifest = os.path.join(root, "manifest.json")
    if os.path.exists(manifest):
        with open(manifest) as fh:
            clips = json.load(fh)
        if len(clips) >= N_CLIPS:
            return clips[:N_CLIPS]
    import cv2

    if os.path.exists(DEMO_MP4):
        frames = []
        cap = cv2.VideoCapture(DEMO_MP4)
        while True:
            ok, f = cap.read()
            if not ok:
                break
            frames.append(cv2.resize(f[:, :, ::-1], (FRAME_HW, FRAME_HW),
                                     interpolation=cv2.INTER_AREA))
        cap.release()
        wav, rate = media.read_wav(DEMO_WAV)
        wav = wav[0]
    else:  # hermetic fallback: synthetic content
        rng = np.random.RandomState(0)
        frames = [rng.randint(0, 255, (FRAME_HW, FRAME_HW, 3), dtype=np.uint8)
                  for _ in range(CLIP_FRAMES + 17)]
        wav, rate = rng.randn(WAV_SAMPLES * 2).astype(np.float32) * 0.1, 16000
    frames = np.stack(frames)
    n_src = len(frames)
    wav16 = np.clip(wav * 32767, -32768, 32767).astype(np.int16)
    face_scale = FACE_HW / FRAME_HW

    clips, t0 = [], time.perf_counter()
    for i in range(N_CLIPS):
        base = os.path.join(root, f"clip_{i:05d}")
        entry = {"avi": base + ".avi", "face": base + "_face.npy",
                 "wav": base + ".wav"}
        if not os.path.exists(entry["wav"]):
            # rolled window + flip parity: varied JPEG content per clip
            start = (i * 7) % n_src
            idx = (start + np.arange(CLIP_FRAMES)) % n_src
            clip = frames[idx]
            if i % 2:
                clip = clip[:, :, ::-1]
            ingest.write_mjpeg_avi(entry["avi"], clip, fps=25.0, quality=90)
            faces = np.stack([
                cv2.resize(f, (FACE_HW, FACE_HW), interpolation=cv2.INTER_AREA)
                for f in clip
            ])
            np.save(entry["face"], faces.astype(np.uint8))
            ws = (i * 997) % max(1, len(wav16) - WAV_SAMPLES)
            w = wav16[ws : ws + WAV_SAMPLES]
            w = np.pad(w, (0, WAV_SAMPLES - len(w)))
            _write_wav16(entry["wav"], w, rate=16000)
        clips.append(entry)
    with open(manifest, "w") as fh:
        json.dump(clips, fh)
    print(f"# corpus: built {N_CLIPS} clips in {time.perf_counter()-t0:.0f}s "
          f"under {root}", flush=True)
    return clips


def _write_wav16(path: str, samples: np.ndarray, rate: int) -> None:
    import wave

    with wave.open(path, "wb") as fh:
        fh.setnchannels(1)
        fh.setsampwidth(2)
        fh.setframerate(rate)
        fh.writeframes(samples.astype("<i2").tobytes())


# ---------------------------------------------------------------------------
# Phase 1: streaming decode workers → wire-format clip dicts


def _to_wire_video(rgb_frames: np.ndarray) -> np.ndarray:
    """[T, H, W, 3] uint8 RGB → wire format ([T, H*3/2, W] I420 or RGB).

    The I420 conversion runs as ONE cvtColor over the [T·H, W, 3] tall
    image when H % 4 == 0 (every frame's packed U/V planes then occupy
    whole w-wide rows — h·w/4 bytes = h/4 rows each — so the tall planes
    reshape exactly to per-frame planes; profiled ~25% cheaper than T
    separate calls on the 1-core host). H ≡ 2 (mod 4) geometries fall
    back to per-frame conversion, which only needs H even."""
    if RGB_WIRE:
        return rgb_frames
    import cv2

    t, h, w, _ = rgb_frames.shape
    if h % 4:
        return np.stack([
            cv2.cvtColor(np.ascontiguousarray(f), cv2.COLOR_RGB2YUV_I420)
            for f in rgb_frames
        ])  # [t, h·3/2, w]
    tall = cv2.cvtColor(np.ascontiguousarray(rgb_frames.reshape(t * h, w, 3)),
                        cv2.COLOR_RGB2YUV_I420)  # [(t·h)·3/2, w]
    y = tall[: t * h].reshape(t, h, w)
    chroma = tall[t * h :].reshape(2, t, h // 4, w)  # U then V, per frame
    return np.concatenate([y, chroma[0], chroma[1]], axis=1)  # [t, h·3/2, w]


def decode_clip(entry: dict) -> dict:
    from affectgpt_tpu.data import media

    frames = media.read_video_frames(entry["avi"], n_frms=FRAMES)
    faces = np.load(entry["face"], mmap_mode="r")
    fidx = np.linspace(0, len(faces) - 1, FRAMES).astype(int)
    faces = np.ascontiguousarray(faces[fidx])
    wav, _ = media.read_wav(entry["wav"])
    wav16 = np.clip(wav[0] * 32767, -32768, 32767).astype(np.int16)
    wav16 = np.pad(wav16, (0, max(0, WAV_SAMPLES - len(wav16))))[:WAV_SAMPLES]
    return {
        "frame": _to_wire_video(frames),
        "face": _to_wire_video(faces),
        "wav": wav16,
    }


class DecodeWorkers:
    """N threads streaming clips → a bounded queue of wire dicts. Busy
    time is summed per worker so the anatomy line can report host decode
    occupancy. cv2/np decode releases the GIL during C calls, so on this
    1-core host the workers overlap the main thread's device waits."""

    def __init__(self, clips: list, n_workers: int):
        self.todo = queue.Queue()
        for c in clips:
            self.todo.put(c)
        self.done: "queue.Queue[dict]" = queue.Queue(maxsize=2 * BATCH)
        self.busy = [0.0] * n_workers
        self.threads = [
            threading.Thread(target=self._run, args=(w,), daemon=True)
            for w in range(n_workers)
        ]

    def start(self):
        for t in self.threads:
            t.start()

    def _run(self, w: int):
        while True:
            try:
                entry = self.todo.get_nowait()
            except queue.Empty:
                return
            t0 = time.perf_counter()
            try:
                wire = decode_clip(entry)
            except Exception as exc:  # noqa: BLE001 — a corrupt clip must
                # fail the bench loudly, not strand next_batch() forever on
                # an item that will never arrive (this process holds the
                # exclusive TPU slot while it waits).
                self.done.put({"__error__": (entry, repr(exc))})
                continue
            self.busy[w] += time.perf_counter() - t0
            self.done.put(wire)

    def next_batch(self, n: int) -> dict:
        items = []
        for _ in range(n):
            it = self.done.get()
            if "__error__" in it:
                entry, err = it["__error__"]
                raise RuntimeError(f"decode worker failed on {entry}: {err}")
            items.append(it)
        return {k: np.stack([it[k] for it in items]) for k in items[0]}


# ---------------------------------------------------------------------------


def main():
    from affectgpt_tpu.inference import chat as chat_mod
    from affectgpt_tpu.inference import generate as gen
    from affectgpt_tpu.models import affectgpt, clip_vit, hubert
    from affectgpt_tpu.ops import image as image_ops
    from bench import build, make_clip_batch, qwen_3b_config

    corpus_root = os.environ.get(
        "RT_E2E_CORPUS",
        f"/tmp/affectgpt_e2e_corpus_{FRAME_HW}x{CLIP_FRAMES}",
    )
    clips = build_corpus(corpus_root)

    if TINY:
        from dataclasses import replace as _replace

        from affectgpt_tpu.models import qwen2 as _q

        cfg, frozen, trainable = build(_q.QwenConfig.tiny(vocab_size=1024))
        vision_cfg = _replace(clip_vit.ClipVisionConfig.tiny(),
                              projection_dim=cfg.visual_dim)
        audio_cfg = _replace(hubert.HubertConfig.tiny(), hidden_size=cfg.acoustic_dim)
    else:
        cfg, frozen, trainable = build(qwen_3b_config())
        vision_cfg = clip_vit.ClipVisionConfig.vit_l_14()
        audio_cfg = hubert.HubertConfig.large()
    frozen = dict(frozen)
    frozen["visual_encoder"] = clip_vit.init_vision_params(
        jax.random.PRNGKey(2), vision_cfg, dtype=jnp.bfloat16)
    frozen["acoustic_encoder"] = hubert.init_params(
        jax.random.PRNGKey(3), audio_cfg, dtype=jnp.bfloat16)
    print(f"# device: {jax.devices()[0]}", flush=True)

    input_ids, _, offsets = make_clip_batch(cfg, BATCH)
    # bench.make_clip_batch honors BENCH_PROMPT_LEN — derive lengths from
    # the ids it actually built, not this file's PROMPT_LEN constant
    prompt_len = int(input_ids.shape[1])
    lengths = jnp.full((BATCH,), prompt_len, jnp.int32)
    gcfg = gen.GenerateConfig(max_new_tokens=NEW, do_sample=False, eos_token_id=0)
    max_len = prompt_len + NEW + 32
    win_starts = np.linspace(0, WAV_SAMPLES - WIN, FRAMES).astype(int)

    @jax.jit
    def e2e_clip_to_tokens(frozen, trainable, wire, input_ids, lengths):
        if RGB_WIRE:
            frame, face = wire["frame"], wire["face"]
        else:
            frame = image_ops.yuv420_to_rgb(wire["frame"])
            face = image_ops.yuv420_to_rgb(wire["face"])
        wav = wire["wav"].astype(jnp.float32) / 32768.0  # [b, WAV_SAMPLES]
        audio = jnp.stack([wav[:, s : s + WIN] for s in win_starts], axis=1)
        raw = {"frame": frame, "face": face,
               "audio": audio[:, :, None, :].astype(jnp.bfloat16)}
        feats = chat_mod.encode_media_features(
            frozen, cfg, raw, vision_cfg=vision_cfg, audio_cfg=audio_cfg)
        feats = {m: f.astype(jnp.bfloat16) for m, f in feats.items()}
        embeds = affectgpt.build_inputs_embeds(
            frozen, trainable, cfg, input_ids, feats, offsets)
        toks, _ = gen.generate(
            frozen["llm"], cfg.llm, gcfg, embeds, lengths, jax.random.PRNGKey(0),
            max_len=max_len, lora=None)
        return toks

    # --- warmup: compile on one pre-decoded batch (excluded) ---
    warm_workers = DecodeWorkers(clips[:BATCH], WORKERS)
    warm_workers.start()
    warm = warm_workers.next_batch(min(BATCH, len(clips)))
    if warm["frame"].shape[0] < BATCH:  # pad tiny smoke corpora
        reps = -(-BATCH // warm["frame"].shape[0])
        warm = {k: np.concatenate([v] * reps)[:BATCH] for k, v in warm.items()}
    batch_mb = sum(v.nbytes for v in warm.values()) / 1e6
    dev_warm = {k: jax.device_put(v) for k, v in warm.items()}
    np.asarray(e2e_clip_to_tokens(frozen, trainable, dev_warm, input_ids, lengths))

    # standalone phase timings for the anatomy line
    t0 = time.perf_counter()
    dev_warm = {k: jax.device_put(v) for k, v in warm.items()}
    for v in dev_warm.values():
        np.asarray(v[:1, :1])  # tiny fetch fences the transfer
    t_upload = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(e2e_clip_to_tokens(frozen, trainable, dev_warm, input_ids, lengths))
    t_device = time.perf_counter() - t0

    # --- measured stream: decode → upload → compute, double-buffered ---
    # upload(k) → dispatch(k) → fence(k-1) on the MAIN thread is the
    # measured-best schedule on the tunneled backend (21.7-23.7 clips/s
    # clean; device 3.12 s/batch): device_put is async (≤0.9 s/batch of
    # thread time for the 85 MB), so upload(k) rides under the fence(k-1)
    # wait. A look-ahead uploader THREAD measured no better (13.4 at
    # queue depth 2 / 14.9 at depth 1 vs 15.3 mainline, all under equal
    # host CPU contention): the relay is a single ordered stream, so
    # uploads submitted ahead of turn queue bulk bytes in front of the
    # small token fetches the fences need.
    n_batches = len(clips) // BATCH
    if n_batches == 0:
        raise SystemExit(
            f"corpus smaller than one batch ({len(clips)} clips < batch {BATCH}): "
            "raise RT_E2E_CLIPS or lower RT_E2E_BATCH"
        )
    n_stream = n_batches * BATCH
    workers = DecodeWorkers(clips[:n_stream], WORKERS)
    workers.start()
    pending = []
    t_start = time.perf_counter()
    for b in range(n_batches):
        host = workers.next_batch(BATCH)
        dev = {k: jax.device_put(v) for k, v in host.items()}  # async upload
        pending.append(e2e_clip_to_tokens(frozen, trainable, dev, input_ids, lengths))
        if len(pending) > 1:
            np.asarray(pending.pop(0))  # fence batch k-1; k's upload overlaps
    for toks in pending:
        np.asarray(toks)
    wall = time.perf_counter() - t_start
    host_busy = sum(workers.busy)

    cps = n_stream / wall
    print(json.dumps({
        "metric": (
            "tri-modal REALTIME clips/sec E2E incl. host decode + upload ("
            + ("tiny-smoke" if TINY else "CLIP-L + HuBERT-large on device, 3B LLM")
            + f", {n_stream} on-disk clips, {FRAMES} frames+faces, {NEW}-tok decode, "
            + f"batch {BATCH}, {WORKERS} decode threads, "
            + ("RGB" if RGB_WIRE else "YUV420") + " wire)"
        ),
        "value": round(cps, 2),
        "unit": "clips/s",
        "vs_realtime_baseline": round(cps / REFERENCE_REALTIME_CLIPS_PER_SEC, 3),
        "anatomy": {
            "wall_s_per_batch": round(wall / n_batches, 3),
            "host_decode_s_per_batch": round(host_busy / n_batches, 3),
            "upload_s_per_batch": round(t_upload, 3),
            "device_s_per_batch": round(t_device, 3),
            "batch_mb": round(batch_mb, 1),
            "host_decode_occupancy": round(host_busy / wall, 3),
        },
    }), flush=True)


if __name__ == "__main__":
    main()
