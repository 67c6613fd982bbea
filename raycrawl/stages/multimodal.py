"""Multimodal payload stages: image / video / audio as opaque binary
columns with typed metadata, processed by actor-pool ``map_batches`` stages.

The container ships no real media libraries, so — per the build spec — the
*codec* layer is a deterministic fake (raycrawl.core.codec for images; raw
PCM synth for audio; concatenated image frames for video) while the Ray
plumbing (schemas, batch sizing, actor signatures, output layout) is real
and tested. ``decode_real_*`` functions are the clearly-marked stubs where
PIL/ffmpeg would slot in.

Batch sizing note: rows are bytes-heavy, so these stages run with small
``batch_size`` (64-256) and Arrow batch format end-to-end — the pattern
for 100 TB image/audio corpora where a batch × concurrency must fit the
worker heap.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

from ..core.codec import (
    decode_image,
    encode_image,
    phash64,
    synth_pixels,
)

# ------------------------------------------------------------------ images


class ImageFeatures:
    """Decode each image payload and emit brightness/channel statistics."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        mean_b, std_b, mr, mg, mb = [], [], [], [], []
        for buf in batch["bytes"]:
            px, _ = decode_image(buf.as_py())
            f = px.astype(np.float64)
            mean_b.append(round(float(f.mean()), 4))
            std_b.append(round(float(f.std()), 4))
            mr.append(round(float(f[..., 0].mean()), 4))
            mg.append(round(float(f[..., 1].mean()), 4))
            mb.append(round(float(f[..., 2].mean()), 4))
        cols = {n: batch[n] for n in batch.column_names if n != "bytes"}
        cols.update(
            brightness=pa.array(mean_b, pa.float64()),
            contrast=pa.array(std_b, pa.float64()),
            mean_r=pa.array(mr, pa.float64()),
            mean_g=pa.array(mg, pa.float64()),
            mean_b=pa.array(mb, pa.float64()),
        )
        return pa.table(cols)


class ImageResize:
    """Nearest-neighbour resize to a fixed target, re-encoded as lossless.

    Stateful stage: the target-index grids are cached per actor."""

    def __init__(self, target_w: int = 32, target_h: int = 32):
        self.tw, self.th = target_w, target_h

    def _resize(self, px: np.ndarray) -> np.ndarray:
        h, w, _ = px.shape
        yi = (np.arange(self.th) * h // self.th).clip(0, h - 1)
        xi = (np.arange(self.tw) * w // self.tw).clip(0, w - 1)
        return px[np.ix_(yi, xi)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out, ws, hs = [], [], []
        for buf in batch["bytes"]:
            px, _ = decode_image(buf.as_py())
            small = self._resize(px)
            out.append(encode_image(small, "png"))
            ws.append(self.tw)
            hs.append(self.th)
        cols = {n: batch[n] for n in batch.column_names
                if n not in ("bytes", "w", "h", "fmt")}
        cols.update(
            bytes=pa.array(out, pa.large_binary()),
            w=pa.array(ws, pa.int32()),
            h=pa.array(hs, pa.int32()),
            fmt=pa.array(["png"] * len(out), pa.string()),
        )
        return pa.table(cols)


AUG_CROP_FRAC = 0.875  # the classic 87.5% random-crop of training loaders


def augment_params(image_id: str, w: int, h: int) -> tuple[bool, int, int, int]:
    """Deterministic augmentation draw for one image: (flip, crop_x,
    crop_y, bright_pct). Seeded from md5 of the image id so any replica
    (and the python test oracle) derives the identical transform —
    the property a resumable training pipeline needs from its
    augmentation pass."""
    import hashlib

    h64 = int.from_bytes(hashlib.md5(image_id.encode()).digest()[:8], "little")
    cw = max(1, int(w * AUG_CROP_FRAC))
    ch = max(1, int(h * AUG_CROP_FRAC))
    return (
        bool(h64 & 1),
        int((h64 >> 1) % (w - cw + 1)),
        int((h64 >> 17) % (h - ch + 1)),
        int(80 + (h64 >> 33) % 41),  # brightness 80..120%
    )


def apply_augment(px: np.ndarray, image_id: str) -> tuple[np.ndarray, tuple]:
    """Flip → crop → brightness, all integer-exact (half-up rounding) so
    the transform replays bit-identically anywhere."""
    h, w, _ = px.shape
    flip, cx, cy, pct = augment_params(image_id, w, h)
    if flip:
        px = px[:, ::-1]
    cw = max(1, int(w * AUG_CROP_FRAC))
    ch = max(1, int(h * AUG_CROP_FRAC))
    px = px[cy : cy + ch, cx : cx + cw]
    px = np.clip(
        np.floor(px.astype(np.float64) * pct / 100.0 + 0.5), 0, 255
    ).astype(np.uint8)
    return px, (flip, cx, cy, pct)


class ImageAugment:
    """Deterministic train-time augmentation (hash-seeded flip / 87.5%
    crop / brightness jitter) emitting the transform params and the
    augmented image's phash per row — the per-epoch augmentation pass of
    an image training pipeline, reproducible across retries because the
    draw is a pure function of the image id. Bytes never leave the
    stage; output rows are ~50 B."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, flips, cxs, cys, pcts, ws, hs, phs = [], [], [], [], [], [], [], []
        for image_id, buf in zip(batch["image_id"].to_pylist(), batch["bytes"]):
            px, _ = decode_image(buf.as_py())
            out, (flip, cx, cy, pct) = apply_augment(px, image_id)
            ids.append(image_id)
            flips.append(flip)
            cxs.append(cx)
            cys.append(cy)
            pcts.append(pct)
            hs.append(out.shape[0])
            ws.append(out.shape[1])
            phs.append(phash64(out))
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "flip": pa.array(flips, pa.bool_()),
                "crop_x": pa.array(cxs, pa.int32()),
                "crop_y": pa.array(cys, pa.int32()),
                "bright_pct": pa.array(pcts, pa.int32()),
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
                "aug_phash": pa.array(phs, pa.int64()),
            }
        )


# ------------------------------------------------------------------- video

VIDEO_MAGIC = b"FVID"


def synth_video(seed: int, n_frames: int = 8, w: int = 32, h: int = 24) -> bytes:
    """Deterministic fake video: concatenated frame payloads with a header."""
    frames = [
        encode_image(synth_pixels(seed + i, w, h), "png") for i in range(n_frames)
    ]
    head = VIDEO_MAGIC + struct.pack("<I", n_frames)
    body = b"".join(struct.pack("<I", len(f)) + f for f in frames)
    return head + body


def decode_video_frames(data: bytes) -> list[np.ndarray]:
    if data[:4] != VIDEO_MAGIC:
        return decode_real_video(data)
    (n,) = struct.unpack("<I", data[4:8])
    off = 8
    frames = []
    for _ in range(n):
        (ln,) = struct.unpack("<I", data[off : off + 4])
        off += 4
        frames.append(decode_image(data[off : off + ln])[0])
        off += ln
    return frames


def decode_real_video(data: bytes) -> list[np.ndarray]:
    """STUB: real container/codec demuxing needs ffmpeg/pyav — absent here."""
    raise NotImplementedError("real video decoding requires ffmpeg/pyav")


class FrameSampler:
    """Sample every k-th frame of each video payload, emit one row per
    sampled frame with its phash (frame-level near-dup key)."""

    def __init__(self, every: int = 2):
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids, idxs, phashes = [], [], []
        for vid_id, buf in zip(batch["video_id"].to_pylist(), batch["bytes"]):
            frames = decode_video_frames(buf.as_py())
            for i in range(0, len(frames), self.every):
                vids.append(vid_id)
                idxs.append(i)
                phashes.append(phash64(frames[i]))
        return pa.table(
            {
                "video_id": pa.array(vids, pa.string()),
                "frame_index": pa.array(idxs, pa.int32()),
                "frame_phash": pa.array(phashes, pa.int64()),
            }
        )


# ------------------------------------------------------------------- audio

AUDIO_MAGIC = b"FAUD"
SAMPLE_RATE = 8000


def synth_audio(seed: int, seconds: float = 0.5) -> bytes:
    """Deterministic fake audio: summed sines + noise as int16 PCM."""
    rng = np.random.Generator(np.random.PCG64(seed))
    n = int(SAMPLE_RATE * seconds)
    t = np.arange(n) / SAMPLE_RATE
    f1, f2 = rng.integers(100, 1000, 2)
    sig = 0.5 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(2 * np.pi * f2 * t)
    sig += rng.normal(0, 0.05, n)
    pcm = np.clip(sig * 32767, -32768, 32767).astype(np.int16)
    return AUDIO_MAGIC + struct.pack("<I", SAMPLE_RATE) + zlib.compress(pcm.tobytes())


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    if data[:4] != AUDIO_MAGIC:
        return decode_real_audio(data)
    (sr,) = struct.unpack("<I", data[4:8])
    pcm = np.frombuffer(zlib.decompress(data[8:]), dtype=np.int16)
    return pcm, sr


def decode_real_audio(data: bytes) -> tuple[np.ndarray, int]:
    """STUB: real audio decoding requires soundfile/librosa — absent here."""
    raise NotImplementedError("real audio decoding requires soundfile/librosa")


class SpeechSegments:
    """VAD-style segmentation: framewise RMS (``frame_ms`` windows) is
    thresholded into speech/silence activity and run-length encoded into
    segments — the split an audio-curation pipeline runs before ASR or
    per-utterance sampling. One row per segment (audio_id, seg_idx,
    is_speech, start_ms, dur_ms); ~40 B each regardless of clip length,
    bytes never leave the stage."""

    def __init__(self, frame_ms: int = 20, rms_threshold: float = 0.05):
        self.frame_ms = frame_ms
        self.rms_threshold = rms_threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        aids, seg, speech, start, dur = [], [], [], [], []
        for aid, buf in zip(batch["audio_id"].to_pylist(), batch["bytes"]):
            pcm, sr = decode_audio(buf.as_py())
            x = pcm.astype(np.float64) / 32768.0
            flen = sr * self.frame_ms // 1000
            nf = len(x) // flen
            if not nf:
                continue
            fr = x[: nf * flen].reshape(nf, flen)
            act = np.sqrt((fr * fr).mean(axis=1)) > self.rms_threshold
            change = np.nonzero(np.diff(act))[0] + 1
            bounds = [0, *change.tolist(), nf]
            for s, (lo, hi) in enumerate(zip(bounds[:-1], bounds[1:])):
                aids.append(aid)
                seg.append(s)
                speech.append(bool(act[lo]))
                start.append(lo * self.frame_ms)
                dur.append((hi - lo) * self.frame_ms)
        return pa.table(
            {
                "audio_id": pa.array(aids, pa.string()),
                "seg_idx": pa.array(seg, pa.int32()),
                "is_speech": pa.array(speech, pa.bool_()),
                "start_ms": pa.array(start, pa.int32()),
                "dur_ms": pa.array(dur, pa.int32()),
            }
        )


class AudioFeatures:
    """RMS energy + zero-crossing rate per payload (numpy, vectorized)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        rms, zcr, dur = [], [], []
        for buf in batch["bytes"]:
            pcm, sr = decode_audio(buf.as_py())
            x = pcm.astype(np.float64) / 32768.0
            rms.append(round(float(np.sqrt(np.mean(x**2))), 6))
            zcr.append(round(float(np.mean(np.abs(np.diff(np.sign(x))) > 0)), 6))
            dur.append(round(len(x) / sr, 4))
        cols = {n: batch[n] for n in batch.column_names if n != "bytes"}
        cols.update(
            rms=pa.array(rms, pa.float64()),
            zero_crossing_rate=pa.array(zcr, pa.float64()),
            duration_s=pa.array(dur, pa.float64()),
        )
        return pa.table(cols)


def _popcount_u64(x: "np.ndarray") -> "np.ndarray":
    """SWAR popcount over a uint64 array, returned as int64."""
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def _frame_phash_deltas(buf: bytes) -> tuple["np.ndarray", "np.ndarray"]:
    """Decode a video blob → (per-frame phash int64 array, consecutive
    Hamming distances). The shared primitive behind scene-cut detection
    and shot keyframe sampling."""
    frames = decode_video_frames(buf)
    ph = np.array([phash64(f) for f in frames], dtype=np.int64)
    if len(ph) >= 2:
        u = ph.view(np.uint64)
        d = _popcount_u64(u[1:] ^ u[:-1])
    else:
        d = np.zeros(0, dtype=np.int64)
    return ph, d


class SceneCutDetector:
    """Scene-change detection per video: phash every frame, a cut is a
    consecutive-frame Hamming distance above ``threshold`` bits. Emits one
    row per video (n_frames, n_cuts, max_jump) — the shot-segmentation
    primitive a video-curation pipeline runs before per-shot sampling.
    Actor-pool stage: construct once, decode per batch; payload bytes
    never leave the stage."""

    def __init__(self, threshold: int = 10):
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids, nfr, ncut, mjump = [], [], [], []
        for vid_id, buf in zip(batch["video_id"].to_pylist(), batch["bytes"]):
            ph, d = _frame_phash_deltas(buf.as_py())
            vids.append(vid_id)
            nfr.append(len(ph))
            ncut.append(int((d > self.threshold).sum()) if len(d) else 0)
            mjump.append(int(d.max()) if len(d) else 0)
        return pa.table(
            {
                "video_id": pa.array(vids, pa.string()),
                "n_frames": pa.array(nfr, pa.int32()),
                "n_cuts": pa.array(ncut, pa.int32()),
                "max_jump": pa.array(mjump, pa.int32()),
            }
        )


class ShotKeyframes:
    """Per-shot representative-frame sampling: split each video at its
    scene cuts (consecutive-frame phash Hamming distance > ``threshold``)
    and emit one row per shot with the MIDDLE frame's phash as the shot
    key — the frame a video-curation pipeline would embed/caption instead
    of processing every frame. Output rows are ~40 B each regardless of
    video size; the bytes never leave the stage."""

    def __init__(self, threshold: int = 10):
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids, shot, start, nfr, key = [], [], [], [], []
        for vid_id, buf in zip(batch["video_id"].to_pylist(), batch["bytes"]):
            ph, d = _frame_phash_deltas(buf.as_py())
            if not len(ph):
                continue
            # cut after frame i when d[i] > threshold
            bounds = [0] + [i + 1 for i in np.nonzero(d > self.threshold)[0]] + [len(ph)]
            for s, (lo, hi) in enumerate(zip(bounds[:-1], bounds[1:])):
                vids.append(vid_id)
                shot.append(s)
                start.append(lo)
                nfr.append(hi - lo)
                key.append(int(ph[(lo + hi - 1) // 2]))
        return pa.table(
            {
                "video_id": pa.array(vids, pa.string()),
                "shot_idx": pa.array(shot, pa.int32()),
                "start_frame": pa.array(start, pa.int32()),
                "n_frames": pa.array(nfr, pa.int32()),
                "key_phash": pa.array(key, pa.int64()),
            }
        )
